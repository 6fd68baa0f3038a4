"""Evidence for the r16 streaming shuffle-sizing change (VERDICT r15
#3): run one stateful replay + one admit-loop replay at the old (32)
and new (8) settings and print the OBSERVABLE layout facts — state
store directory count per stateful operator, shard files per landed
``batch=`` dir, and row-identity of the results.

Usage: python scripts/evidence_stream_partitions.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def state_dirs(ckpt: str) -> int:
    # state/<operator_id>/<partition_id>/... — count partition dirs of
    # operator 0
    parts = glob.glob(os.path.join(ckpt, "state", "0", "*"))
    return len([p for p in parts if os.path.isdir(p)])


def batch_files(out_dir: str) -> list[int]:
    out = []
    for b in sorted(glob.glob(os.path.join(out_dir, "batch=*"))):
        out.append(len(glob.glob(os.path.join(b, "part-*.parquet"))))
    return out


def run_stateful(spark, parts: str):
    from airline_data_pipeline_spark.streaming.events import (
        dedup_events_stream,
        read_event_stream,
        start_parquet_sink,
    )

    os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = parts
    ev = table(spark, SF, "events")
    src = tempfile.mkdtemp(prefix="spark_graft_evsrc_")
    out = tempfile.mkdtemp(prefix="spark_graft_evout_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_evckpt_")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    start_parquet_sink(
        dedup_events_stream(
            read_event_stream(spark, src, max_files_per_trigger=2),
            watermark="87600 hours",
        ),
        out, ckpt, available_now=True,
    )
    rows = sorted(
        (r["event_id"],) for r in spark.read.parquet(out).collect()
    )
    n_state = state_dirs(ckpt)
    for d in (src, out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_STREAM_PARTITIONS", None)
    return n_state, rows


def run_admit(spark, parts: str):
    from airline_data_pipeline_spark.operators import dedup
    from airline_data_pipeline_spark.streaming.events import (
        read_docs_stream,
        run_corpus_ingest_admit_sink,
    )

    os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = parts
    d = table(spark, SF, "documents")
    ref = d.filter(F.col("source") == "src0")
    inc = d.filter(F.col("source") != "src0")
    idx = tempfile.mkdtemp(prefix="spark_graft_evidx_")
    src = tempfile.mkdtemp(prefix="spark_graft_evsrc2_")
    out = tempfile.mkdtemp(prefix="spark_graft_evout2_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_evckpt2_")
    stage = tempfile.mkdtemp(prefix="spark_graft_evstage_")
    dedup.write_minhash_index(ref, idx, num_hashes=32, bands=16)
    batch_expr = F.expr("CAST(substring(source, 4) AS INT) % 4")
    for k in range(4):
        part_dir = f"{stage}/b{k}"
        inc.filter(batch_expr == k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        dst = f"{src}/{k:04d}.parquet"
        shutil.move(glob.glob(f"{part_dir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    run_corpus_ingest_admit_sink(
        read_docs_stream(spark, src, max_files_per_trigger=1),
        idx, out, ckpt, threshold=0.7,
    )
    rows = sorted(
        (r["doc_id"],)
        for r in spark.read.parquet(out + "/batch=*").select("doc_id").collect()
    )
    files = batch_files(out)
    for p in (idx, src, out, ckpt, stage):
        shutil.rmtree(p, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_STREAM_PARTITIONS", None)
    return files, rows


def main() -> None:
    spark = get_spark("evidence_stream_partitions")
    s32, rows32 = run_stateful(spark, "32")
    s8, rows8 = run_stateful(spark, "8")
    print(f"stateful dedup replay: state dirs per operator "
          f"32-> {s32}, 8-> {s8}")
    print(f"  result identical: {rows32 == rows8} ({len(rows32)} rows)")
    f32, arows32 = run_admit(spark, "32")
    f8, arows8 = run_admit(spark, "8")
    print(f"admit loop: part files per landed batch= dir "
          f"32-> {f32}, 8-> {f8}")
    print(f"  result identical: {arows32 == arows8} ({len(arows32)} rows)")


if __name__ == "__main__":
    main()
