"""Per-phase job/wall profile of split_hot_cells (guide §1, VERDICT
r15 #4): wraps the verb's internal collaborators with job-counting
shims to attribute the maintenance pass's ~10 jobs/split before
merging any of them.

Usage: python scripts/profile_split_jobs.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.operators import similarity  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

COUNTS: dict[str, list[float]] = {}


def _jobs(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


def _wrap(spark, mod, name):
    orig = getattr(mod, name)

    def shim(*a, **k):
        j0, t0 = _jobs(spark), time.time()
        out = orig(*a, **k)
        COUNTS.setdefault(name, [0, 0.0, 0])
        COUNTS[name][0] += _jobs(spark) - j0
        COUNTS[name][1] += time.time() - t0
        COUNTS[name][2] += 1
        return out

    setattr(mod, name, shim)


def main() -> None:
    spark = get_spark("profile_split_jobs")
    import airline_data_pipeline_spark.io.writers as writers

    for fn in ("_fit_centroids", "_finish_cell_split", "_write_meta",
               "load_ivf_index", "read_small_rows"):
        _wrap(spark, similarity, fn)
    _wrap(spark, writers, "replace_parquet_dir")

    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    root = tempfile.mkdtemp(prefix="spark_graft_profsplit_")
    # coarse 4-centroid build with a 5% cap -> several hot cells
    similarity.write_ivf_index(e, root, n_centroids=4, files_per_cell=2)
    j0, t0 = _jobs(spark), time.time()
    done = similarity.split_hot_cells(
        spark, root, max_cell_fraction=0.05, max_parallel_stages=1
    )
    total_j, total_t = _jobs(spark) - j0, time.time() - t0
    print(f"split_hot_cells: {len(done)} splits, {total_j} jobs, "
          f"{total_t:.2f}s")
    attributed = 0
    for name, (j, t, n) in sorted(COUNTS.items()):
        print(f"  {name:<24} {j:>3} jobs  {t:>7.2f}s  ({n} calls)")
        attributed += j
    print(f"  {'UNATTRIBUTED (stage writes, detection)':<24} "
          f"{total_j - attributed} jobs")
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
