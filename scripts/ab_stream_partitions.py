"""A/B: streaming replay rows at spark.sql.shuffle.partitions = 32
(session default on local[32]) vs 8 (state/batch-volume-sized) —
guide §2.1/§5 via VERDICT r15 #3: every per-trigger shuffle inside a
foreachBatch gate (AQE is disabled under streaming plans, so the
setting is LITERAL there) and every stateful-operator state store
fans out to the session's shuffle-partition count, on micro-batches
whose data is kilobytes.

Interleaved reps (A,B,A,B,...) with one warm-up per leg; median + best
per leg printed. Usage: python scripts/ab_stream_partitions.py [rows...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROWS = sys.argv[1:] or [
    "streaming_ingest_gate",
    "streaming_ingest_admit_loop",
    "streaming_vector_admit_loop",
    "streaming_ann_annotate_pq",
]

REPS = 3


def main() -> None:
    spark = get_spark("ab_stream_partitions")
    reg = registry()
    default = spark.conf.get("spark.sql.shuffle.partitions")

    def run_once(name: str, parts: str) -> float:
        # the sinks read $SPARK_GRAFT_STREAM_PARTITIONS at replay
        # start (scoped_stream_shuffle_partitions) — setting it to the
        # session default reproduces the pre-change behavior exactly
        os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = parts
        try:
            t0 = time.monotonic()
            reg[name].fn(spark, SF).collect()
            return time.monotonic() - t0
        finally:
            os.environ.pop("SPARK_GRAFT_STREAM_PARTITIONS", None)

    for name in ROWS:
        # warm-up once per leg (JIT + codegen for both partition plans)
        run_once(name, default)
        run_once(name, "8")
        a: list[float] = []
        b: list[float] = []
        for _ in range(REPS):
            a.append(run_once(name, default))
            b.append(run_once(name, "8"))
        print(
            f"{name}: parts={default} med {statistics.median(a):.3f}s "
            f"best {min(a):.3f}s | parts=8 med {statistics.median(b):.3f}s "
            f"best {min(b):.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
