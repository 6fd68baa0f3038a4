"""Per-trigger profile of the vector admit loop (guide §1): replays
q_streaming_vector_admit_loop's exact artifact shape and prints each
micro-batch's engine-reported durations (triggerExecution, addBatch =
the foreachBatch gate body, latestOffset/walCommit = checkpoint
bookkeeping) plus the phase wall/job split, so the next optimization
targets the measured cost, not a guess.

Usage: python scripts/profile_vec_admit.py
"""

from __future__ import annotations

import glob
import json
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


def _jobs(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


def main() -> None:
    from airline_data_pipeline_spark.streaming.events import (
        read_vectors_stream,
        run_vector_ingest_admit_sink,
    )

    spark = get_spark("profile_vec_admit")
    e = table(spark, SF, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    ref = e.filter(F.col("label") == 0)
    inc = e.filter(F.col("label") != 0)
    idx = tempfile.mkdtemp(prefix="spark_graft_pvadmit_idx_")
    src = tempfile.mkdtemp(prefix="spark_graft_pvadmit_src_")
    out_dir = tempfile.mkdtemp(prefix="spark_graft_pvadmit_out_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_pvadmit_ckpt_")
    stage = tempfile.mkdtemp(prefix="spark_graft_pvadmit_stage_")

    t0, j0 = time.time(), _jobs(spark)
    similarity.write_srp_index(ref, idx, dims=64, n_bits=2, n_tables=24)
    print(f"write_srp_index: {time.time()-t0:.2f}s {_jobs(spark)-j0} jobs")

    t0, j0 = time.time(), _jobs(spark)
    for k in range(4):
        part_dir = f"{stage}/b{k}"
        inc.filter(F.col("vec_id") % 4 == k).select(
            "vec_id", "embedding"
        ).coalesce(1).write.mode("overwrite").parquet(part_dir)
        dst = f"{src}/{k:04d}.parquet"
        shutil.move(glob.glob(f"{part_dir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    print(f"land 4 source files: {time.time()-t0:.2f}s {_jobs(spark)-j0} jobs")

    t0, j0 = time.time(), _jobs(spark)
    q = run_vector_ingest_admit_sink(
        read_vectors_stream(spark, src, max_files_per_trigger=1),
        idx, out_dir, ckpt, threshold=0.45, round_digits=4,
    )
    print(f"4-trigger replay: {time.time()-t0:.2f}s {_jobs(spark)-j0} jobs")
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        dur = d.get("durationMs", {})
        print(
            f"  batch {d.get('batchId')}: rows={d.get('numInputRows')} "
            f"triggerExecution={dur.get('triggerExecution')}ms "
            f"addBatch={dur.get('addBatch')}ms "
            f"latestOffset={dur.get('latestOffset')}ms "
            f"walCommit={dur.get('walCommit')}ms "
            f"commitOffsets={dur.get('commitOffsets')}ms"
        )
    t0, j0 = time.time(), _jobs(spark)
    landed = spark.read.parquet(out_dir + "/batch=*")
    landed.agg(F.count(F.lit(1))).collect()
    print(f"final count: {time.time()-t0:.2f}s {_jobs(spark)-j0} jobs")
    for p in (idx, src, out_dir, ckpt, stage):
        shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    main()
