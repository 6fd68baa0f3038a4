"""airline_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
(`itsmuriuki/airline_data_pipeline`), designed for 100 TB-scale
execution on a real cluster:

- DataFrame / Spark SQL logical plans everywhere (Catalyst + Tungsten
  pick the physical strategy; no hand-scheduled execution).
- Built-in column expressions instead of row-wise Python (`clean_time`
  and friends become `lpad`/`concat_ws`, not UDFs).
- Inter-stage CSV materialization from the reference becomes one lazy
  lineage with Parquet checkpoints only at pipeline boundaries.
- Extension surface for large-scale training-data pipelines:
  deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  embedding similarity search, text analysis, multimodal binary
  columns, and Structured Streaming over event tables.

Package map:
  session      SparkSession factory (AQE, UTC, arrow)
  io           schema'd readers/writers, testdata loader, SFTP landing
  functions    scalar/array column expression helpers (no hot-path UDFs)
  operators    engine-level ops (cleaning, validation, pagination,
               dedup, similarity, as-of join, top-k)
  queries      the reference's analytical queries (per-airline metrics,
               route analysis, rollups) + the oracle-checked suite
  pipeline     staged batch runner replacing the reference's Airflow DAG
  streaming    Structured Streaming over the events table
  multimodal   binary-column (image/audio/video) plumbing with stubbed decoders
"""

from airline_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
