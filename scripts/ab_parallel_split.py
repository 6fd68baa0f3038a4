"""Interleaved A/B (guide §2.6): split_hot_cells with the per-cell
fit/stage jobs overlapped (max_parallel_stages=4) vs serialized
(max_parallel_stages=1). Both legs run the same three-phase body
(fit-all -> stage-all -> commit-sequentially), so the A/B isolates the
concurrency alone; the artifact is content-identical either way (fits
deterministic, gid allocation and commits sequential in hot order).

Usage: python scripts/ab_parallel_split.py [reps]
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
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_parallel_split")
    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )

    def run(workers: int) -> float:
        root = tempfile.mkdtemp(prefix="ab_psplit_")
        similarity.write_ivf_index(e, root, n_centroids=4, files_per_cell=2)
        t0 = time.time()
        done = similarity.split_hot_cells(
            spark, root, max_cell_fraction=0.05,
            refine_iters=1, max_parallel_stages=workers,
        )
        dt = time.time() - t0
        assert len(done) >= 2, done  # the overlap must be exercised
        shutil.rmtree(root, ignore_errors=True)
        return dt

    run(4)  # warm-up
    res: dict[int, list[float]] = {1: [], 4: []}
    for _ in range(reps):
        for w in (1, 4):
            res[w].append(run(w))
    for w in (1, 4):
        xs = sorted(res[w])
        print(
            f"max_parallel_stages={w}: med {xs[len(xs) // 2]:.3f}s"
            f"  best {xs[0]:.3f}s  all {[round(x, 3) for x in xs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
