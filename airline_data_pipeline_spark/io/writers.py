"""Sinks (SURVEY.md §2.1 S4-S6).

The reference materializes CSV between every stage (`ingest.py:337`,
`process.py:172`) and bulk-inserts row tuples into Postgres
(`dags/flight_data_pipeline.py:100-122`). Here stages stay lazy; these
writers are for pipeline *boundaries* only — Parquet internally, CSV
only as an export-compat format, JDBC with per-partition batch writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink — the engine's internal checkpoint format.

    ``partition_by`` (e.g. a date-derived column) is what makes the
    P4-style range predicates partition-prunable at scale.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout (the data-skipping write path).

    `repartitionByRange` (sampled range boundaries, one shuffle) +
    `sortWithinPartitions` lays rows out so each output file covers a
    narrow, near-disjoint range of ``cluster_by`` — parquet footer
    min/max stats then let ANY engine (Spark, DuckDB, Trino) skip whole
    files/row-groups for range predicates on those columns. This is the
    single biggest lever for 100 TB range scans after directory
    partitioning: directory partitions prune coarse keys (day), range
    clustering prunes within them (hour, user bucket, ship date),
    without the tiny-directory explosion per-key partitioning causes.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in cluster_by]
    out = df
    if num_files is not None:
        out = out.repartitionByRange(num_files, *cols)
    else:
        out = out.repartitionByRange(*cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def write_parquet_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered parquet layout for TWO numeric
    columns — multi-dimensional data skipping.

    1D range clustering (`write_parquet_clustered`) gives perfect
    pruning on one column and none on a second; interleaving the bits
    of both columns' min/max-quantized ranks gives each file a compact
    BOX in (x, y) space, so footer stats prune range predicates on
    EITHER column (each to ~√(1/num_files) of the range instead of all
    of it) — the Delta/Iceberg OPTIMIZE ZORDER technique, as plain
    Spark expressions. The quantization stats ride in a broadcast
    1-row join; the bit interleave is a fixed chain of `bits`×2 shift/
    mask terms, comfortably inside whole-stage codegen.
    """
    from pyspark.sql import functions as F

    assert len(cols) == 2, "z-order here is 2-D; use write_parquet_clustered for 1-D"
    x, y = (F.col(c).cast("double") for c in cols)
    stats = df.agg(
        F.min(x).alias("__x_lo"), F.max(x).alias("__x_hi"),
        F.min(y).alias("__y_lo"), F.max(y).alias("__y_hi"),
    )
    top = (1 << bits) - 1

    def quant(v, lo, hi):
        # A constant column (hi == lo) would make the bucket width 0 and
        # the division null; `least` ignores nulls, silently sending
        # every row to the top bucket. Quantize constants to 0 instead —
        # clustering degrades to 1-D on the varying column.
        return F.when(
            hi > lo,
            F.least(
                F.lit(top),
                F.floor((v - lo) / ((hi - lo) / (1 << bits))).cast("long"),
            ),
        ).otherwise(F.lit(0).cast("long"))

    with_stats = df.join(F.broadcast(stats))
    qx = quant(x, F.col("__x_lo"), F.col("__x_hi"))
    qy = quant(y, F.col("__y_lo"), F.col("__y_hi"))
    morton = F.lit(0).cast("long")
    for b in range(bits):
        morton = (
            morton
            + F.shiftleft(F.shiftright(qx, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(qy, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    (
        with_stats.withColumn("__z", morton)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", "__x_lo", "__x_hi", "__y_lo", "__y_hi")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction (table maintenance op).

    Streaming sinks and fine-grained ingest leave thousands of KB-sized
    files; at scale that turns every scan into a file-listing + footer
    storm and starves the scheduler with sliver tasks. This rewrites
    ``src`` into ``dest`` at ~``target_file_bytes`` per file using
    `coalesce` (narrow — merges files without shuffling rows). Sizing
    reads the source through the Hadoop FileSystem API, so it works on
    HDFS/S3/local alike. Returns the number of output files.
    """
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    total_bytes = jpath.getFileSystem(hconf).getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    spark.read.parquet(src).coalesce(n_files).write.mode("overwrite").parquet(dest)
    return n_files


def write_csv_export(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink for compatibility with the reference's outputs (op S4).

    ``single_file=True`` coalesces to one partition — only for small
    result exports (the metric tables), never for data-scale tables.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink — columnar interchange with Hive/Trino-side warehouses
    (built into Spark; same predicate-pushdown/column-pruning story as
    parquet on the read side)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    dbtable: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """JDBC sink (op S6) — replaces the reference's row-tuple loop
    (`dags/flight_data_pipeline.py:112-122`) with parallel per-partition
    batched inserts."""
    props = {"batchsize": str(batchsize)}
    props.update(properties or {})
    df.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", dbtable
    ).options(**props).save()


def write_json_summary(records: list[dict], path: str) -> None:
    """Small-result JSON sink (op S5): metric summaries are driver-side
    documents (`dags/flight_data_pipeline.py:176-177,221-222`), not
    distributed data — compose and dump locally."""
    import json

    with open(path, "w") as f:
        json.dump(records, f, indent=2, default=str)
