"""Interleaved A/B for the read_meta_first in-process fast path
(guide §5: no driver jobs for driver-sized data): times the heaviest
meta-reading composition rows with the fast path ON vs forced OFF
(every one-row meta read routed back through a full Spark job), on the
same session, alternating, best + median of N. Outputs are inherently
identical — both paths return the same committed row; the unit test
asserts the Row parity, this script measures the job-floor savings.

Usage: python scripts/ab_meta_fastpath.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airline_data_pipeline_spark.operators import (  # noqa: E402
    dedup,
    maintenance,
    similarity,
)
from airline_data_pipeline_spark.queries import suite  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = [
    "knn_via_maintained_ivf_index",
    "incremental_dedup_via_maintained_index",
    "knn_via_pq_ivf_index",
]
PATCH_MODULES = [similarity, dedup, maintenance, suite]


def spark_only_read(spark, path):
    return spark.read.parquet(path).first()


def set_fast(on: bool) -> None:
    from airline_data_pipeline_spark.io.readers import read_meta_first

    fn = read_meta_first if on else spark_only_read
    for mod in PATCH_MODULES:
        mod.read_meta_first = fn


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_meta_fastpath")
    reg = suite.registry()
    for name in ROWS:
        fn = reg[name].fn
        fn(spark, SF).collect()  # JIT/codegen warm-up
        res: dict[bool, list[float]] = {True: [], False: []}
        for _ in range(reps):
            for on in (False, True):
                set_fast(on)
                t0 = time.time()
                fn(spark, SF).collect()
                res[on].append(time.time() - t0)
        set_fast(True)
        for on in (False, True):
            xs = sorted(res[on])
            label = "fast" if on else "spark-job"
            print(
                f"{name:<42} {label:<9} med {xs[len(xs) // 2]:.3f}s"
                f"  best {xs[0]:.3f}s  all {[round(x, 3) for x in xs]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
