"""Minhash-watch endgame (VERDICT r11 #6): does pinning the
post-candidate-join partition count collapse the 1.4-2.4 s dispersion
band?

Hypothesis under test: the band is AQE re-planning jitter — adaptive
coalescing picks a different post-shuffle partition count for the
candidate-join stages run to run (runtime stats differ slightly), and
the varying task counts produce the executor-WAIT swings
`scripts/profile_minhash.py` attributed the band to. If true, running
the SHIPPED `dedup_minhash` form with
`spark.sql.adaptive.coalescePartitions.enabled=false` (partitions
pinned at spark.sql.shuffle.partitions for every shuffle) should show
a materially narrower band over interleaved reps.

Protocol (the standing measurement disciplines):
- 10 INTERLEAVED reps per form, alternating order per round so JVM
  warm-up bias cancels,
- clearCache + forced GC between reps,
- bench canary before/after to certify the session quiet,
- identical query shape both arms (the conf is session-level and
  settable per rep; AQE itself stays ON both arms — only partition
  coalescing is frozen in the pinned arm).

Decision rule (pre-registered): pinned band width (max-min) under
HALF the default arm's → ship the conf for this query; otherwise the
band is scheduling noise AQE doesn't cause → record the closing note
in BASELINE.md and retire the watch.

Run on an otherwise-idle box:  python scripts/ab_minhash_pinned_partitions.py
"""

from __future__ import annotations

import gc
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.operators import dedup  # noqa: E402
from airline_data_pipeline_spark.queries.suite import fan_out  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPS = 10
PIN_CONF = "spark.sql.adaptive.coalescePartitions.enabled"


def run_once(spark, pinned: bool) -> float:
    spark.conf.set(PIN_CONF, "false" if pinned else "true")
    d = fan_out(table(spark, SF_DIR, "documents"))
    kept = dedup.dedup_minhash(d, threshold=0.7, num_hashes=32, bands=16)
    t0 = time.perf_counter()
    out = d.agg(F.count(F.lit(1)).alias("before")).crossJoin(
        kept.agg(F.count(F.lit(1)).alias("after"))
    )
    rows = out.collect()
    dt = time.perf_counter() - t0
    assert rows and rows[0]["before"] > rows[0]["after"] > 0
    return dt


def canary(spark) -> float:
    import bench

    return bench.cpu_canary_sec(spark)


def main():
    spark = get_spark("minhash_pin_ab")
    c_before = canary(spark)
    for pinned in (False, True):  # one untimed warm-up per arm
        run_once(spark, pinned)

    walls: dict[str, list[float]] = {"default": [], "pinned": []}
    for rep in range(REPS):
        order = (("default", False), ("pinned", True))
        if rep % 2:
            order = order[::-1]
        for name, pinned in order:
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            time.sleep(0.3)
            walls[name].append(run_once(spark, pinned))
    spark.conf.set(PIN_CONF, "true")
    c_after = canary(spark)

    def stats(v):
        return {
            "median": round(statistics.median(v), 3),
            "best": round(min(v), 3),
            "band_width": round(max(v) - min(v), 3),
            "stdev": round(statistics.stdev(v), 3),
            "all": [round(x, 3) for x in v],
        }

    out = {
        "sf": SF_DIR,
        "reps": REPS,
        "canary_sec": {"before": round(c_before, 3), "after": round(c_after, 3)},
        "wall_sec": {k: stats(v) for k, v in walls.items()},
    }
    d, p = out["wall_sec"]["default"], out["wall_sec"]["pinned"]
    out["verdict"] = (
        "SHIP the pinned conf"
        if p["band_width"] * 2 < d["band_width"]
        else "band persists under pinning — retire the watch as scheduling noise"
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
