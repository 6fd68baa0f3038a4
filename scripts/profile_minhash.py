"""Stage-level attribution for the minhash watch (VERDICT r10 #3).

Four rounds of BASELINE.md notes tracked `minhash_dedup_count` at
1.7-2.4 s vs the 1.121 s r6 anchor as "ambient drift" without naming
where the time goes. This script closes the watch with data instead of
another band note:

- 10 INTERLEAVED reps of the anchor-era `.persist()` form vs the
  shipped `localCheckpoint(eager=False)` form (alternating, so JVM
  warm-up ordering bias cancels — the round-8 measurement lesson),
- `spark.catalog.clearCache()` + forced GC between reps (CacheManager
  serves persisted plans to logically-equivalent queries otherwise),
- per-rep STAGE metrics from the Spark UI REST API (executorRunTime,
  executorCpuTime, jvmGcTime, shuffle bytes, per stage NAME), so the
  wall-clock delta is attributed to a named stage or to GC rather
  than guessed at,
- the bench canary (pure-codegen hash loop) before and after, so the
  session itself is certified quiet.

Run on an otherwise-idle box:  python scripts/profile_minhash.py
Prints a JSON summary; the conclusion lives in BASELINE.md.
"""

from __future__ import annotations

import gc
import json
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.operators import dedup  # noqa: E402
from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.queries.suite import fan_out  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
UI_PORT = 4050
REPS = 10


def pipeline(spark, reuse: str):
    """q_minhash_dedup_count's exact shape, with the shingle-reuse
    mechanism as a dial: 'lckpt' is the shipped dedup_minhash; 'persist'
    reconstructs the anchor-era r6-r8 form (same plan, reuse node
    differs)."""
    d = fan_out(table(spark, SF_DIR, "documents"))
    if reuse == "lckpt":
        kept = dedup.dedup_minhash(d, threshold=0.7, num_hashes=32, bands=16)
        return d, kept, None
    sh = dedup.shingle_sets(d, "text", "doc_id", 3).persist()
    banded = dedup._banded_buckets(sh, "doc_id", 32, 16)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    dups = dedup.jaccard_verify(pairs, d, "text", "doc_id", 3, 0.7, shingle_df=sh)
    kept = d.join(
        dups.select(F.col("id_b").alias("doc_id")).distinct(),
        on="doc_id",
        how="left_anti",
    )
    return d, kept, sh


def run_once(spark, reuse: str) -> float:
    d, kept, sh = pipeline(spark, reuse)
    t0 = time.perf_counter()
    out = d.agg(F.count(F.lit(1)).alias("before")).crossJoin(
        kept.agg(F.count(F.lit(1)).alias("after"))
    )
    rows = out.collect()
    dt = time.perf_counter() - t0
    assert rows and rows[0]["before"] > rows[0]["after"] > 0
    if sh is not None:
        sh.unpersist()
    return dt


def rest(app_path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def stages_since(app_id: str, min_stage: int):
    out = []
    for st in rest(f"applications/{app_id}/stages?status=COMPLETE"):
        if st["stageId"] > min_stage:
            out.append(st)
    return out


def canary(spark) -> float:
    import bench

    return bench.cpu_canary_sec(spark)


def main():
    spark = get_spark(
        "minhash_profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    app_id = rest("applications")[0]["id"]

    c_before = canary(spark)
    # one untimed warm-up per form (JIT/codegen)
    for form in ("persist", "lckpt"):
        run_once(spark, form)

    walls: dict[str, list[float]] = {"persist": [], "lckpt": []}
    # per form: stage-name -> list of per-rep sums
    agg: dict[str, dict[str, dict[str, list[float]]]] = {
        "persist": {}, "lckpt": {},
    }
    watermark = max(
        (s["stageId"] for s in rest(f"applications/{app_id}/stages")), default=-1
    )
    for rep in range(REPS):
        for form in ("persist", "lckpt") if rep % 2 == 0 else ("lckpt", "persist"):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            time.sleep(0.3)
            walls[form].append(run_once(spark, form))
            sts = stages_since(app_id, watermark)
            watermark = max((s["stageId"] for s in sts), default=watermark)
            per_name: dict[str, dict[str, float]] = {}
            for s in sts:
                m = per_name.setdefault(
                    s["name"].split(":")[0],
                    {"run_ms": 0.0, "gc_ms": 0.0, "cpu_ms": 0.0,
                     "shuffle_mb": 0.0, "stages": 0},
                )
                m["run_ms"] += s.get("executorRunTime", 0)
                m["gc_ms"] += s.get("jvmGcTime", 0)
                m["cpu_ms"] += s.get("executorCpuTime", 0) / 1e6
                m["shuffle_mb"] += (
                    s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0)
                ) / 1e6
                m["stages"] += 1
            for name, m in per_name.items():
                slot = agg[form].setdefault(
                    name, {k: [] for k in ("run_ms", "gc_ms", "cpu_ms",
                                           "shuffle_mb", "stages")}
                )
                for k, v in m.items():
                    slot[k].append(v)
    c_after = canary(spark)

    summary = {
        "sf": SF_DIR,
        "reps": REPS,
        "canary_sec": {"before": round(c_before, 3), "after": round(c_after, 3)},
        "wall_sec": {
            f: {
                "median": round(statistics.median(v), 3),
                "best": round(min(v), 3),
                "all": [round(x, 3) for x in v],
            }
            for f, v in walls.items()
        },
        "stage_medians": {
            f: {
                name: {k: round(statistics.median(vals), 1) for k, vals in m.items()}
                for name, m in sorted(
                    agg[f].items(),
                    key=lambda kv: -statistics.median(kv[1]["run_ms"]),
                )
            }
            for f in agg
        },
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
