"""Export sinks — the write side of a training-data pipeline.

The consumer of a 100 TB corpus (a data loader streaming shards to
trainers) wants files of a PREDICTABLE size: too-large files stall the
loader's work stealing, too-small files drown the object store in
requests. Spark's default write emits one file per task — whatever size
the upstream shuffle happened to produce — so the export stage must
impose the sizing itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_sharded_parquet(
    df: DataFrame,
    path: str,
    rows_per_file: int,
    n_shards: int | None = None,
    key: str | Column | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet shards with a hard per-file row cap.

    Two cooperating controls:

    - ``maxRecordsPerFile`` — the task-local hard cap: a task holding
      more rows rolls to a new file. This alone suffices for sizing,
      but skewed upstream partitions still produce skewed file COUNTS
      per task (stragglers at commit time).
    - optional ``n_shards`` + ``key`` — pre-balance: hash-repartition
      directly on ``key`` (round-6 review fix: wrapping it in
      ``pmod(hash(key), n)`` collapsed the domain to n values that
      Spark's HashPartitioning re-hashed balls-into-bins — ~37% of
      tasks got NO rows and others got 2-3 buckets). The hash scatters
      any key skew uniformly, so every task writes ~the same number of
      files. Use a stable id column — the layout is then reproducible
      run-to-run (hash-partitioning is deterministic, unlike
      round-robin ``repartition(n)`` whose assignment depends on input
      split order).

    At 100 TB pick ``n_shards`` ≈ total_rows / (rows_per_file · k) for
    small k, so each task emits k files and the commit fans out evenly.
    """
    out = df
    if n_shards is not None:
        if key is None:
            raise ValueError("n_shards requires a key column to hash on")
        k = F.col(key) if isinstance(key, str) else key
        out = out.repartition(n_shards, k)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout with optional within-file ordering —
    the read-side pruning complement to :func:`write_sharded_parquet`.

    - ``partitionBy`` turns the partition columns into directory keys:
      a reader filtering on them prunes whole directories at PLANNING
      time (``PartitionFilters`` in the scan — zero I/O for excluded
      partitions). At 100 TB this is the first line of defense: a
      date-partitioned corpus makes "last 30 days" scan 30 directories,
      not the lake.
    - ``sort_cols`` sorts WITHIN each task's output file, so parquet
      row-group min/max stats become selective for those columns —
      point lookups skip row groups inside the files that survive
      directory pruning (the poor man's Z-order; one clustered column
      is usually the right call).

    Partition columns should be low-cardinality (directories are
    metadata operations); high-cardinality keys belong in
    ``write_sharded_parquet``'s hash shards or bucketing instead.
    """
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_parquet(
    spark,
    path: str,
    rows_per_file: int,
    key: str | Column | None = None,
) -> tuple[int, int]:
    """Small-files compaction with a crash-safe directory swap — the
    maintenance op every long-running ingest needs (streaming
    foreachBatch appends and per-trigger micro-batches leave one small
    file per task per batch; at 100 TB the object store drowns in
    requests before capacity is an issue).

    Rewrites ``path`` into ``ceil(rows / rows_per_file)`` shards (the
    row count comes from parquet footers — a metadata-only job), then
    swaps directories through the same rename dance as
    ``foreach_batch_upsert``: the previous state survives under
    ``._old`` until the new layout is fully in place, so a crash
    between renames never loses data. With ``key``, shards are
    hash-pre-balanced and the layout is reproducible run-to-run; plain
    ``coalesce`` otherwise (no shuffle at all). On a real deployment a
    table format (Delta/Iceberg OPTIMIZE) does this transactionally;
    this is the plain-parquet stand-in with the same shape.

    Returns (row_count, n_output_shards).
    """
    import math
    import os
    import shutil

    base = path.rstrip("/")
    tmp, old = base + "._compact", base + "._old"
    # crash recovery BEFORE anything else: a previous run that died
    # between the two renames left the data under ._old (and possibly a
    # COMPLETE new layout under ._compact — the base→old rename only
    # happens after a successful write). Finish or roll back the swap
    # so readers and retries see a live ``base`` again.
    if not os.path.isdir(base):
        if os.path.isdir(tmp) and os.path.isdir(old):
            os.rename(tmp, base)  # finish the interrupted swap
            shutil.rmtree(old)
        elif os.path.isdir(old):
            os.rename(old, base)  # roll back
    df = spark.read.parquet(base)
    n = df.count()
    shards = max(1, math.ceil(n / max(1, rows_per_file)))
    # reached only with a live base ⇒ any leftover tmp is a pre-swap
    # partial write — safe to discard
    shutil.rmtree(tmp, ignore_errors=True)
    if key is not None:
        write_sharded_parquet(df, tmp, rows_per_file, n_shards=shards, key=key)
    else:
        (
            df.coalesce(shards)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .parquet(tmp)
        )
    shutil.rmtree(old, ignore_errors=True)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
    return n, shards
