"""Connector layer (§2.1): parsing semantics over small fixtures."""

import zipfile

from pyield_spark.sources import readers as rd


def test_holidays_csv(spark, tmp_path):
    p = tmp_path / "holidays.csv"
    p.write_text("# comment line\n01/01/2024\n25/12/2024\n")
    got = sorted(str(r.data) for r in rd.read_holidays_csv(spark, str(p)).collect())
    assert got == ["2024-01-01", "2024-12-25"]


def test_anbima_at_csv(spark, tmp_path):
    p = tmp_path / "tpf.csv"
    content = (
        "meta line 1\n"
        "meta line 2\n"
        "Titulo@Data Referencia@Codigo SELIC@Data Base/Emissao@Data de Vencimento@Tx. Compra@Tx. Venda@Tx. Indicativas@PU\n"
        "LTN@06/02/2026@100000@07/07/2023@01/01/2030@14,9375@--@14,90@997,241543\n"
    )
    p.write_bytes(content.encode("latin1"))
    bronze = rd.read_anbima_csv_bronze(spark, str(p))
    silver = rd.anbima_silver(bronze)
    row = silver.collect()[0]
    assert row.titulo == "LTN"
    assert str(row.data_referencia) == "2026-02-06"
    assert str(row.data_vencimento) == "2030-01-01"
    assert row.taxa_compra == 0.149375
    assert row.taxa_venda is None  # '--' → null
    assert row.pu == 997.241543
    assert row.codigo_selic == 100000


def test_zip_members(spark, tmp_path):
    z = tmp_path / "archive.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner.csv", "a;b;c\n1;2;3\n")
        zf.writestr("skip.txt", "nope")
    lines = rd.read_zip_members(spark, str(z), member_suffix=".csv")
    got = [r.line for r in lines.collect()]
    assert got == ["a;b;c", "1;2;3"]
    silver = rd.read_semicolon_lines_silver(lines, min_cols=3)
    assert silver.count() == 2


def test_sgs_json(spark, tmp_path):
    p = tmp_path / "sgs.json"
    p.write_text('[{"data":"30/01/2025","valor":"13.15"},{"data":"31/01/2025","valor":"13.17"}]')
    got = {str(r.data): r.valor for r in rd.read_sgs_json(spark, str(p)).collect()}
    assert got == {"2025-01-30": 13.15, "2025-01-31": 13.17}


def test_fixed_width_rate(spark, tmp_path):
    p = tmp_path / "di.txt"
    p.write_text("00001315\n")
    got = rd.read_fixed_width_rate(spark, str(p)).collect()[0].taxa
    assert got == 0.1315


def test_slice_text_table(spark, tmp_path):
    p = tmp_path / "lft.txt"
    p.write_text("header garbage\nEMISSAO DATA\n01/07/2000  1000.000000\n01/01/2001  1010.123456\n")
    rows = rd.slice_text_table(spark, str(p), "EMISSAO", n_cols=2).collect()
    assert len(rows) == 2
    assert rows[0].fields[1].endswith("000000")


def test_ttl_dataset_cache(spark, sf_dir):
    from pyield_spark.sources import cache

    calls = []

    def loader(s):
        calls.append(1)
        return s.read.parquet(f"{sf_dir}/region.parquet")

    cache.clear()
    a = cache.get_dataset(spark, "region", loader, ttl_seconds=60, now=1000.0)
    b = cache.get_dataset(spark, "region", loader, ttl_seconds=60, now=1010.0)
    assert len(calls) == 1  # same bucket → cached
    assert a is b
    c = cache.get_dataset(spark, "region", loader, ttl_seconds=60, now=1070.0)
    assert len(calls) == 2  # bucket rolled → refreshed
    assert c.count() == 5
    cache.clear()


def test_market_hours_filter(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from pyield_spark.streaming.windows import market_hours_filter

    rows = [
        (1, dt.datetime(2024, 3, 4, 10, 0, 0)),   # in session
        (2, dt.datetime(2024, 3, 4, 8, 0, 0)),    # before open
        (3, dt.datetime(2024, 3, 4, 19, 0, 0)),   # after close
        (4, dt.datetime(2024, 12, 24, 10, 0, 0)), # Dec 24 half-holiday
        (5, dt.datetime(2024, 12, 31, 10, 0, 0)), # Dec 31 half-holiday
    ]
    df = spark.createDataFrame(rows, "id INT, ts TIMESTAMP")
    got = sorted(r.id for r in df.filter(market_hours_filter("ts")).collect())
    assert got == [1]
