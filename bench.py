"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship A6 shape, the TPC-H Q1 shape, the star join,
windows, as-of, dedup, and similarity — the queries whose plans matter
at 100 TB. Each query runs once after a JVM warm-up query; value is the
sum of per-query wall times (collect() to completion).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "perf_metrics",
    "pricing_summary",
    "revenue_by_nation",
    "route_metrics",
    "topk_per_group",
    "sessionize",
    "asof_purchase_view",
    "tumbling_window_counts",
    "dedup_exact_docs",
    "minhash_dedup_count",
    "knn_brute_force",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    reg = registry()

    # warm up JIT/codegen paths so measured numbers reflect steady state
    reg["global_stats"].fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        reg[name].fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
