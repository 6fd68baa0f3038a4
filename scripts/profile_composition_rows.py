"""Phase-level profile of the heaviest composition rows (guide §1):
per-phase wall seconds and Spark job counts, to separate per-job
scheduler floors from data work before optimizing anything.

Usage: python scripts/profile_composition_rows.py [ivf_maint|vec_admit]
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


class Phase:
    def __init__(self, spark):
        self.spark = spark
        self.t0 = time.time()
        self.jobs0 = self._jobs()
        self.rows = []

    def _jobs(self) -> int:
        # monotone job-id high-water mark via the status tracker
        ids = self.spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    def mark(self, name: str) -> None:
        t, j = time.time(), self._jobs()
        self.rows.append((name, round(t - self.t0, 3), j - self.jobs0))
        self.t0, self.jobs0 = t, j

    def report(self) -> None:
        total_t = sum(r[1] for r in self.rows)
        total_j = sum(r[2] for r in self.rows)
        for name, dt, dj in self.rows:
            print(f"  {name:<38} {dt:>7.3f}s  {dj:>3} jobs")
        print(f"  {'TOTAL':<38} {total_t:>7.3f}s  {total_j:>3} jobs")


def profile_ivf_maint(spark) -> None:
    from airline_data_pipeline_spark.functions.numeric import round_half_up
    from airline_data_pipeline_spark.operators.maintenance import (
        maintain_stored_index,
    )
    from airline_data_pipeline_spark.operators.topk import top_k_per_group

    print("== knn_via_maintained_ivf_index, one rep ==")
    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    q = e.filter(F.col("vec_id") < 5)
    root = tempfile.mkdtemp(prefix="spark_graft_prof_ivfmaint_")
    p = Phase(spark)
    similarity.write_ivf_index(
        e.filter(F.col("vec_id") % 2 == 0), root, n_centroids=4, files_per_cell=2
    )
    p.mark("write_ivf_index")
    similarity.add_pq_to_ivf_index(spark, root, m=16, ksub=256)
    p.mark("add_pq_to_ivf_index")
    similarity.append_to_ivf_index(e.filter(F.col("vec_id") % 2 == 1), root)
    p.mark("append_to_ivf_index")
    report = maintain_stored_index(
        spark, root, "ivf", max_files_per_table=4,
        max_cell_fraction=0.2, pq_params={"m": 16, "ksub": 256},
    )
    p.mark("maintain_stored_index")
    n_rows = int(
        spark.read.parquet(root + "/meta").first().asDict().get("n_rows") or 0
    )
    scored = similarity.ivf_pq_index_scores(
        q, root, nprobe=99, rerank=max(150, n_rows // 10)
    )
    rounded = scored.select(
        "query_id", "neighbor_id", round_half_up(F.col("score"), 4).alias("score")
    )
    top_k_per_group(
        rounded, ["query_id"], "score", 10, tiebreakers=["neighbor_id"]
    ).orderBy("query_id", F.desc("score"), "neighbor_id").collect()
    p.mark("pq probe-all + topk + collect")
    p.report()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def profile_maintain_only(spark) -> None:
    """maintain_stored_index broken into its internal steps."""
    from airline_data_pipeline_spark.operators import dedup
    from airline_data_pipeline_spark.io.writers import hadoop_fs

    print("== maintain_stored_index(ivf) steps, fresh artifact ==")
    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    root = tempfile.mkdtemp(prefix="spark_graft_prof_maint_")
    similarity.write_ivf_index(
        e.filter(F.col("vec_id") % 2 == 0), root, n_centroids=4, files_per_cell=2
    )
    similarity.add_pq_to_ivf_index(spark, root, m=16, ksub=256)
    similarity.append_to_ivf_index(e.filter(F.col("vec_id") % 2 == 1), root)
    _, fs, P = hadoop_fs(spark, root)
    p = Phase(spark)
    similarity.fsck_ivf_index(spark, root, clean=True).collect()
    p.mark("fsck(clean)")
    similarity.compact_ivf_cells(spark, root)
    p.mark("compact_ivf_cells")
    done = similarity.split_hot_cells(spark, root, max_cell_fraction=0.2)
    p.mark(f"split_hot_cells ({len(done)} split)")
    similarity.add_pq_to_ivf_index(spark, root, m=16, ksub=256)
    p.mark("add_pq re-encode")
    p.report()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "ivf_maint"
    spark = get_spark("profile_composition_rows")
    if which == "ivf_maint":
        profile_ivf_maint(spark)
        profile_maintain_only(spark)
    spark.stop()


if __name__ == "__main__":
    main()
