"""(populated in a later batch)"""
