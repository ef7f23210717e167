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
    - optional ``n_shards`` + ``key`` — pre-balance: repartition on
      ``pmod(hash(key), n_shards)``. The hash scatters any key skew
      uniformly, so every task writes ~the same number of files. Use
      a stable id column — the layout is then reproducible run-to-run
      (hash-partitioning is deterministic, unlike round-robin
      ``repartition(n)`` whose assignment depends on input split
      order).

    At 100 TB pick ``n_shards`` ≈ total_rows / (rows_per_file · k) for
    small k, so each task emits k files and the commit fans out evenly.
    """
    out = df
    if n_shards is not None:
        if key is None:
            raise ValueError("n_shards requires a key column to hash on")
        k = F.col(key) if isinstance(key, str) else key
        out = out.repartition(n_shards, F.pmod(F.hash(k), F.lit(n_shards)))
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
