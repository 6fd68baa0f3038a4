"""Interleaved A/B (guide §1): maintain_stored_index(kind="ivf") with
split_refine_iters 1 vs 2 — each Lloyd refine pass inside a hot-cell
split is one full assign+aggregate job over the hot cell, and
probe-all/top-k results are invariant to the sub-cell assignment
(every row stays reachable; oracle row knn_via_maintained_ivf_index
stays green at both dials), so the orchestrator defaults to 1.

Usage: python scripts/ab_split_refine.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.operators import similarity  # noqa: E402
from airline_data_pipeline_spark.operators.maintenance import (  # noqa: E402
    maintain_stored_index,
)
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_split_refine")
    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )

    def setup() -> str:
        root = tempfile.mkdtemp(prefix="ab_split_")
        similarity.write_ivf_index(
            e.filter(F.col("vec_id") % 2 == 0), root,
            n_centroids=4, files_per_cell=2,
        )
        similarity.add_pq_to_ivf_index(spark, root, m=16, ksub=256)
        similarity.append_to_ivf_index(e.filter(F.col("vec_id") % 2 == 1), root)
        return root

    def run(iters: int) -> float:
        root = setup()
        t0 = time.time()
        maintain_stored_index(
            spark, root, "ivf", max_files_per_table=4,
            max_cell_fraction=0.2, pq_params={"m": 16, "ksub": 256},
            split_refine_iters=iters,
        )
        dt = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return dt

    run(2)  # warm-up
    res: dict[int, list[float]] = {1: [], 2: []}
    for _ in range(reps):
        for it in (2, 1):
            res[it].append(run(it))
    for it in (2, 1):
        xs = sorted(res[it])
        print(
            f"refine_iters={it}: med {xs[len(xs) // 2]:.3f}s"
            f"  best {xs[0]:.3f}s  all {[round(x, 3) for x in xs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
