"""Interleaved A/B: connected_components' convergence check riding the
update join (r15) vs the old third new-vs-old join per round.

Old (pre-r15): each round = neighbor-min join + label-update join +
a NEW-vs-OLD re-join whose only product was the changed count.
New: the changed flag is computed IN the update join ("__nm is
non-null and < cluster_id" — labels only decrease, so that is exactly
"new != old") and counted from the already-materialized checkpoint
blocks — two joins per round, one flag-scan count.

Variants via monkeypatching dedup.connected_components with the old
body (copied verbatim below). Bit-identity asserted first.

Usage: python scripts/ab_cc_changed_flag.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from airline_data_pipeline_spark.operators import dedup  # noqa: E402
from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

ROWS = ["dedup_clusters_docs", "embedding_dedup_clusters"]
REPS = 4


def old_connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Pre-r15 body, verbatim (third join per round)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = ids.select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col(id_col).alias("dst"), F.col("cluster_id").alias("__nl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias(id_col))
            .agg(F.min("__nl").alias("__nm"))
        )
        new_labels = (
            labels.join(neighbor_min, id_col, "left")
            .select(
                F.col(id_col),
                F.least(F.col("cluster_id"), F.coalesce("__nm", "cluster_id")).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), id_col)
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_cc_changed_flag")
    reg = registry()
    new_cc = dedup.connected_components

    for name in ROWS:
        fn = reg[name].fn

        def run(new: bool) -> float:
            dedup.connected_components = new_cc if new else old_connected_components
            spark.catalog.clearCache()  # the op's documented edge-cache hygiene
            t0 = time.time()
            fn(spark, sf_dir).collect()
            return time.time() - t0

        dedup.connected_components = old_connected_components
        spark.catalog.clearCache()
        rows_a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        dedup.connected_components = new_cc
        spark.catalog.clearCache()
        rows_b = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert rows_a == rows_b, f"{name}: variant outputs differ!"
        print(f"{name}: bit-identical over {len(rows_a)} rows")

        run(False)
        run(True)
        t_a, t_b = [], []
        for _ in range(REPS):
            t_a.append(run(False))
            t_b.append(run(True))
        print(
            f"{name}: 3-join med {statistics.median(t_a):.3f}s "
            f"(best {min(t_a):.3f}) reps {[round(t, 3) for t in t_a]}"
        )
        print(
            f"{name}: flag   med {statistics.median(t_b):.3f}s "
            f"(best {min(t_b):.3f}) reps {[round(t, 3) for t in t_b]}"
        )
    dedup.connected_components = new_cc
    spark.stop()


if __name__ == "__main__":
    main()
