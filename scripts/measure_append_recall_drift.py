"""Measure recall drift on an APPENDED IVF index at fixed nprobe.

`append_to_ivf_index` assigns new batches to the FROZEN centroids. The
documented trade: probes stay consistent and appends stay O(batch),
but as the corpus outgrows the centroid model, fixed-nprobe recall can
drift below what a re-fit index would give — the signal that schedules
a rebuild. This script puts numbers on that dial at sf0.1:

- corpus split: build on the even-id half, append the odd-id half;
- ground truth: brute-force exact top-10 per query (50 queries);
- compare recall@10 at nprobe 1/2/4/8 for (a) the GROWN index (frozen
  half-corpus centroids) vs (b) a REBUILT index (centroids re-fit on
  the full corpus).

Run on an otherwise-idle box:
  python scripts/measure_append_recall_drift.py
Prints a JSON line; the conclusion lives in BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.operators import similarity  # noqa: E402
from airline_data_pipeline_spark.operators.topk import top_k_per_group  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50
NPROBES = (1, 2, 4, 8)
N_CENTROIDS = 16


def topk_sets(scored, k: int) -> dict[int, set[int]]:
    ranked = top_k_per_group(
        scored, ["query_id"], "score", k, ascending=False,
        tiebreakers=["neighbor_id"],
    )
    out: dict[int, set[int]] = {}
    for r in ranked.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(truth: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return round(hits / sum(len(v) for v in truth.values()), 4)


def main() -> None:
    spark = get_spark("append_recall_drift")
    e = table(spark, BASE, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES)
    truth = topk_sets(similarity.brute_force_scores(e, q), K)

    grown = tempfile.mkdtemp(prefix="recall_grown_")
    rebuilt = tempfile.mkdtemp(prefix="recall_rebuilt_")
    try:
        similarity.write_ivf_index(
            e.filter(F.col("vec_id") % 2 == 0), grown, n_centroids=N_CENTROIDS
        )
        similarity.append_to_ivf_index(e.filter(F.col("vec_id") % 2 == 1), grown)
        similarity.write_ivf_index(e, rebuilt, n_centroids=N_CENTROIDS)

        rows = {}
        for np_ in NPROBES:
            rows[np_] = {
                "grown": recall(
                    truth, topk_sets(similarity.ivf_index_scores(q, grown, nprobe=np_), K)
                ),
                "rebuilt": recall(
                    truth,
                    topk_sets(similarity.ivf_index_scores(q, rebuilt, nprobe=np_), K),
                ),
            }
        print(
            json.dumps(
                {
                    "corpus_rows": e.count(),
                    "n_queries": N_QUERIES,
                    "k": K,
                    "n_centroids": N_CENTROIDS,
                    "recall_at_10_by_nprobe": rows,
                }
            )
        )
    finally:
        shutil.rmtree(grown, ignore_errors=True)
        shutil.rmtree(rebuilt, ignore_errors=True)


if __name__ == "__main__":
    main()
