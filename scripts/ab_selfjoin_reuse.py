"""Interleaved A/B: self-join key-table reuse (localCheckpoint) vs
re-derivation per join side, over the registry rows whose candidate
generator self-joins a derived key table.

The optimization (r15): `dedup_minhash` / `minhash_candidates` /
`simhash_near_dups` / `winnow_shared_pairs` / `cosine_near_dup_pairs`
self-join a key table derived by an expensive pipeline (32-hash minhash
signature aggregate, 60-bit SimHash vote aggregate, sliding-window
fingerprint pass, SRP Arrow matmul). Without materialization Catalyst
plans the derivation ONCE PER JOIN SIDE. A lazy localCheckpoint on the
derived table makes both sides read the same RDD blocks.

Variants toggle via the operators' module-level `_reuse` seam:
  A (recompute): `_reuse` patched to identity — the pre-r15 plan.
  B (reuse):     shipped code.

Protocol: bit-identity check first (exact tuple compare, both variants
collected and sorted), then one warm-up each, then N interleaved timed
reps per variant; report per-rep times, medians, best.

Usage: python scripts/ab_selfjoin_reuse.py [row ...]  (default: all)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airline_data_pipeline_spark.operators import dedup, similarity  # noqa: E402
from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

ROWS = [
    "minhash_dedup_count",
    "simhash_near_dups",
    "winnow_fingerprint_pairs",
    "embedding_near_dups",
]

REPS = 4


def main() -> None:
    rows = sys.argv[1:] or ROWS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_selfjoin_reuse")
    reg = registry()

    identity = lambda df: df  # noqa: E731
    reuse_d, reuse_s = dedup._reuse, similarity._reuse

    def set_variant(reuse: bool) -> None:
        dedup._reuse = reuse_d if reuse else identity
        similarity._reuse = reuse_s if reuse else identity

    for name in rows:
        fn = reg[name].fn

        def run(reuse: bool) -> float:
            set_variant(reuse)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            return time.time() - t0

        # bit-identity: exact row compare
        set_variant(False)
        rows_a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        set_variant(True)
        rows_b = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert rows_a == rows_b, f"{name}: variant outputs differ!"
        print(f"{name}: bit-identical over {len(rows_a)} rows")

        run(False)
        run(True)  # warm-ups
        t_a, t_b = [], []
        for _ in range(REPS):
            t_a.append(run(False))
            t_b.append(run(True))
        print(
            f"{name}: recompute med {statistics.median(t_a):.3f}s "
            f"(best {min(t_a):.3f}) reps {[round(t, 3) for t in t_a]}"
        )
        print(
            f"{name}: reuse     med {statistics.median(t_b):.3f}s "
            f"(best {min(t_b):.3f}) reps {[round(t, 3) for t in t_b]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
