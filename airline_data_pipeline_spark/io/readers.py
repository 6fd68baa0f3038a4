"""Schema'd sources (SURVEY.md §2.1 S1-S3, S7).

Every reader takes an explicit schema; nothing in the engine relies on
CSV inference (the reference infers everywhere — `ingest.py:73`,
`api/app.py:121` — which costs a full extra pass at scale and produces
data-dependent types).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airline_data_pipeline_spark.io import schemas

# Per-session {(sf_dir, name): DataFrame} relation cache. The testdata
# tables are immutable inputs, so the analyzed scan relation (file
# listing + parquet footer schema) is reusable across queries in a
# session — exactly what a catalog/metastore provides. Without it every
# query re-lists the directory and re-reads footers (~50-100 ms per
# table reference, driver side).
#
# The cache lives as an attribute ON the SparkSession object, not in a
# module-level (weak-keyed) dict: cached DataFrames hold a strong ref to
# their session (DataFrame._session), so any rooted mapping whose VALUES
# are DataFrames keeps its own weak keys alive forever — a WeakKey-
# Dictionary here can never actually drop an entry (ADVICE r5). Stored
# on the session, the whole session→cache→DataFrame→session loop is a
# plain reference cycle with no external root, which the cyclic GC
# collects as soon as the caller drops the session. A `newSession()`
# sibling (same applicationId, different session state) naturally gets
# its own attribute, preserving per-session isolation.
_CACHE_ATTR = "_airline_pipeline_table_cache"

# Sessions whose reader confs are already pinned — the three conf.set
# calls below are py4j round-trips, so do them once per session, not on
# every table() call. A bool doesn't reference the session, so the
# weak-keyed dict genuinely drops entries here.
_CONF_PINNED: weakref.WeakKeyDictionary[SparkSession, bool] = weakref.WeakKeyDictionary()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (parquet, self-describing schema).

    The `ts` column must come out as one canonical type — session-TZ
    TIMESTAMP (micros) — under every parquet encoding the driver has
    shipped so far:

    - TIMESTAMP(NANOS): Spark's vectorized reader has no nanos type;
      with `spark.sql.legacy.parquet.nanosAsLong` it arrives as a nanos
      long and is truncated to microseconds here — exactly what DuckDB's
      ns→µs conversion does, so the oracle agrees.
    - timestamp[us] tz-naive (current testdata): Spark 4 infers
      TIMESTAMP_NTZ by default (`spark.sql.parquet.inferTimestampNTZ.
      enabled` flipped to true), which chronon extractors like
      `unix_micros` reject. Disabled below so the scan yields TIMESTAMP;
      the schema loop additionally casts any NTZ column that slips
      through (e.g. a DataFrame built before the conf was set). The
      session TZ is pinned UTC, so NTZ→TIMESTAMP preserves the wall
      clock and the tz-naive DuckDB oracle still agrees.

    The confs are set here, at read time, because callers (the driver's
    correctness harness in particular) may hand us a bare SparkSession
    that never went through `session.get_spark()`. All three are
    runtime-settable SQL confs, so this makes the reader self-sufficient
    on any session.
    """
    if not _CONF_PINNED.get(spark):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # UTC pin: timestamp→date casts and window boundaries are
        # session-TZ dependent in Spark, while the DuckDB oracle is
        # TZ-naive. The host runs UTC, so this is normally a no-op — it
        # exists so a non-UTC caller session cannot silently shift
        # event-time semantics.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _CONF_PINNED[spark] = True
    per_session = getattr(spark, _CACHE_ATTR, None)
    if per_session is None:
        per_session = {}
        setattr(spark, _CACHE_ATTR, per_session)
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    per_session[key] = df
    return df


def fan_out(df: DataFrame, min_ratio: int = 4, barrier: bool = True) -> DataFrame:
    """Repartition a NARROW scan up to the session's parallelism —
    only when the source layout starves it.

    Parquet splits at row-group boundaries, so a small single-row-group
    file scans as ONE partition no matter what maxPartitionBytes says,
    and every row-local stage downstream serializes onto one core
    (measured: doc_repetition_by_source 1.87 s → 0.73 s at sf0.1 with
    this fan-out; the BENCH_SCALE_r07 campaign first caught the effect
    as a 1-task codegen stage pinning one core while 31 idled).

    Use it ONLY where substantial per-row work precedes the first
    shuffle (shingling, hashing, Arrow matmuls, trigram analysis). A
    query whose first operation is a groupBy/applyInPandas gains
    nothing — its own shuffle already redistributes — and pays a whole
    extra exchange (measured: grouped_zscore 1.20 s → 1.60 s). The
    guard is a no-op when the scan already has ≥ parallelism/min_ratio
    partitions, so on a real multi-file table (or a 100 TB one) this
    adds nothing.

    The repartition path ends in a pushdown BARRIER — an always-true
    nondeterministic filter (``monotonically_increasing_id() >= 0``;
    the ids are nonneg by construction). Catalyst pushes deterministic
    FILTERS below a round-robin exchange (projections stay put), so
    without it a caller whose per-row work is a filter — exactly this
    helper's contract — gets that filter re-serialized onto the
    starved scan partition: corpus_prep's trigram gate ran on 1 core
    with 31 idle. Interleaved A/B at single-file sf0.1 (6 reps,
    gate→dedup→tokens consumer): barrier med 0.80 s vs 2.80 s without
    — 3.5×. Nondeterministic filters cannot be reordered, so every
    later predicate stays above the exchange; the lost parquet-level
    pushdown is irrelevant on the no-op path (real layouts), which
    adds no barrier and keeps scan pushdown intact.

    ``barrier=False`` for callers whose NEXT op is a cheap selective
    filter they want at the scan (a `source == 'x'` ref/inc split)
    while their heavy per-row work is a projection (shingling), which
    Catalyst never pushes below the exchange anyway. Interleaved A/B
    (5 reps, sf0.1): the barrier costs those shapes 3-7% (e.g.
    incremental_minhash 2.52→2.58 med) — keep it only where the heavy
    work is the filter itself.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_ratio <= target:
        out = df.repartition(target)
        if barrier:
            out = out.filter(F.monotonically_increasing_id() >= 0)
        return out
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables and register them as temp views.

    Registered views let every query run through either the DataFrame
    API or ``spark.sql`` — same Catalyst plan either way.
    """
    out: dict[str, DataFrame] = {}
    for name in schemas.TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_flights_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    strict_layout: bool = False,
    required_columns: list[str] | None = None,
) -> DataFrame:
    """CSV scan with declared schema (op S1).

    Reference: `pd.read_csv(path, low_memory=False)` at
    `data_ingestion/ingest.py:73` / `ingest.py:311` — full dtype
    inference, an extra pass at scale. Here types are declared.

    Two binding modes, because Spark binds CSV schemas by POSITION:
    - default: header-name binding — parse as strings, then select+cast
      the declared columns by name (robust to column order / extra
      columns; missing declared columns arrive as typed nulls);
    - ``strict_layout=True``: the declared schema matches the file
      layout positionally — the fast path, types parsed in the scan.
    """
    s = schema or schemas.FLIGHTS_RAW_CORE
    if strict_layout:
        return (
            spark.read.schema(s)
            .option("header", True)
            .option("mode", "PERMISSIVE")
            .csv(path)
        )
    raw = spark.read.option("header", True).csv(path)
    present = set(raw.columns)
    if required_columns:
        # The reference's raw-file contract (`ingest.py:80-91`) is
        # against the FILE's header, not the declared engine schema.
        missing = sorted(set(required_columns) - present)
        if missing:
            raise ValueError(f"raw CSV missing required columns: {missing}")
    return raw.select(
        [
            (F.col(f.name) if f.name in present else F.lit(None))
            .cast(f.dataType)
            .alias(f.name)
            for f in s.fields
        ]
    )


def read_weather_json(spark: SparkSession, path: str) -> DataFrame:
    """Whole-document JSON scan → exploded station rows (op S2).

    Reference: `json.load` + structure validation at
    `data_ingestion/ingest.py:97-100,144-152`. The array-of-structs
    becomes one row per station via ``explode`` so the flights⋈weather
    enrichment (the reference's declared To-Do) is a plain equi-join.
    """
    raw = (
        spark.read.schema(schemas.WEATHER)
        .option("multiLine", True)
        .json(path)
    )
    return raw.select(F.explode("stations").alias("s")).select(
        F.col("s.id").alias("station_id"),
        F.col("s.temperature").alias("temperature"),
        F.col("s.conditions").alias("conditions"),
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
    trim_values: bool = False,
) -> DataFrame:
    """XML scan with declared schema (S1 sibling; built into Spark 4 —
    SPARK-44265 merged the spark-xml package upstream).

    The schema is REQUIRED by design: XML inference needs an extra
    full pass over the data (same reason `read_flights_csv` declares
    types), and element-name binding makes the scan robust to element
    order within a row tag. Entity escaping (``&lt; &amp; ...``) is
    undone by the parser, so values round-trip byte-identically
    through `write_xml_export` — including surrounding whitespace:
    Spark's `ignoreSurroundingSpaces` defaults to TRUE (trimming
    `"  x  "` to `"x"`, measured), so this scan pins it false; a
    lenient feed-ingest caller that WANTS trimming passes
    ``trim_values=True``."""
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", row_tag)
        .option("ignoreSurroundingSpaces", "true" if trim_values else "false")
        .load(path)
    )


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque-blob scan via Spark's `binaryFile` source — the ingest
    side of the multimodal pipeline (§2.10): image/audio/video objects
    land as (path, modificationTime, length, content) rows, with
    `content` the raw bytes for the Arrow-batched decode/featurize
    stages in `multimodal/binaryops.py`.

    At 100 TB the media files already sit in object storage and this
    scan is the ONLY full read they get: each file is one row in one
    task (files larger than `maxPartitionBytes` are still single rows
    — binaryFile never splits), so parallelism = file count, and
    `pathGlobFilter` prunes by extension without listing-then-filter.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _local_fs_path(path: str) -> str | None:
    """The local-filesystem form of ``path`` (bare path, ``file:/p``,
    or ``file:///p`` — Hadoop's Path.toString prints the one-slash
    form), or None for any remote scheme."""
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme == "":
        return path
    if parsed.scheme == "file" and parsed.netloc in ("", "localhost"):
        return parsed.path
    return None


def _local_parquet_parts(path: str) -> list[str] | None:
    """Part files of a LOCAL parquet directory (no scheme or file:),
    or None when the path is remote / missing / empty — the signal to
    fall back to a Spark read so error semantics stay exactly Spark's."""
    fs_path = _local_fs_path(path)
    if fs_path is None or not os.path.isdir(fs_path):
        return None
    parts = sorted(
        os.path.join(fs_path, f)
        for f in os.listdir(fs_path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    return parts or None


def read_meta_first(spark: SparkSession, path: str):
    """`spark.read.parquet(path).first()` for the one-row metadata
    tables the stored-index verbs stamp next to their artifacts.

    Every Spark read of such a table is a full driver job — plan,
    schedule, one task, collect — a ~50-100 ms floor paid 10-20 times
    per lifecycle composition rep just to fetch a handful of ints
    (guide §5: the driver should not run jobs for driver-sized data).
    When the path is on the LOCAL filesystem (no scheme, or file:)
    and holds committed part files, read the footer-committed parquet
    in-process with pyarrow instead: same bytes, same row, no job.

    Anything else — remote scheme, missing directory, no part files,
    an unreadable/partial file — falls back to the Spark read so the
    error classes callers match on (`AnalysisException` for a missing
    artifact, see `load_pq_artifact`) are exactly Spark's.

    Scoped to ONE-ROW tables (ADVICE r15): the fast path picks the
    lexicographically-first non-empty part, while Spark's `.first()`
    follows split ordering (largest-first) — the two coincide only
    when the table holds exactly one row, so any table whose footers
    sum to more than one row defers to the Spark read instead of
    silently diverging.
    """
    parts = _local_parquet_parts(path)
    if parts:
        try:
            import pyarrow.parquet as pq
            from pyspark.sql import Row

            if sum(pq.ParquetFile(p).metadata.num_rows for p in parts) > 1:
                return spark.read.parquet(path).first()
            for p in parts:
                t = pq.read_table(p)
                if t.num_rows:
                    return Row(**{
                        k: v[0] for k, v in
                        t.slice(0, 1).to_pydict().items()
                    })
            return None  # committed but empty: match .first()
        except Exception:  # noqa: BLE001 — fall back to Spark's
            pass  # error semantics rather than guess at parity
    return spark.read.parquet(path).first()


def read_small_rows(spark: SparkSession, path: str) -> list:
    """`spark.read.parquet(path).collect()` for MODEL-SIZED tables
    (IVF centroids, PQ codebooks): the same driver-job floor argument
    as `read_meta_first`, for tables of at most a few thousand rows
    that the caller holds in a UDF closure anyway. Row order is not
    part of the contract (Spark's collect order isn't either — it's
    file/split order); callers that need one sort explicitly.
    """
    parts = _local_parquet_parts(path)
    if parts:
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql import Row

            t = pa.concat_tables([pq.read_table(p) for p in parts])
            cols = t.to_pydict()
            names = t.column_names
            return [
                Row(**{k: cols[k][i] for k in names})
                for i in range(t.num_rows)
            ]
        except Exception:  # noqa: BLE001
            pass
    return spark.read.parquet(path).collect()


def count_parquet_rows(spark: SparkSession, path: str) -> int:
    """`spark.read.parquet(path).count()` from footer metadata when the
    table is local: parquet footers carry exact row counts, so the sum
    over committed part files IS the count — no scan job. Handles
    partitioned layouts (cell=N subdirs) by walking them: a count
    never needs the partition column a file-level read would lose.
    Any surprise — a remote scheme, a non-parquet visible file Spark
    would have tried to read, a visible subdirectory that is not a
    ``key=value`` partition dir (Spark's partition discovery fails
    loudly on those — a quiet footer count would mask the corruption,
    ADVICE r15), an unreadable footer — falls back to the Spark count
    so drift-detection semantics (fsck's ledger recount) stay exactly
    Spark's."""
    fs_path = _local_fs_path(path)
    if fs_path is not None and os.path.isdir(fs_path):
        parts: list[str] = []
        ok = True
        for root, dirs, files in os.walk(fs_path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            if not all("=" in d for d in dirs):
                ok = False  # non-partition subtree — let Spark surface it
                break
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                if not f.endswith(".parquet"):
                    ok = False  # Spark would try to read it — defer
                    break
                parts.append(os.path.join(root, f))
            if not ok:
                break
        if ok and parts:
            try:
                import pyarrow.parquet as pq

                return sum(
                    pq.ParquetFile(p).metadata.num_rows for p in parts
                )
            except Exception:  # noqa: BLE001
                pass
    return spark.read.parquet(path).count()


def read_jdbc(
    spark: SparkSession,
    url: str,
    dbtable: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source (op S7) with optional parallel partitioned reads.

    The reference pulls whole SQL results through a single connection
    (`dags/flight_data_pipeline.py:160,206`); at scale a partitioned
    read on a numeric key fans the scan across executors.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    return reader.load()
