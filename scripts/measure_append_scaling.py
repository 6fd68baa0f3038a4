"""Measure the index-append lifecycle's O(batch) claim (round 11).

`append_to_ivf_index` / `append_to_minhash_index` never read the
stored rows — so appending a FIXED batch must cost the same whether
the index holds 1x, 3x, or 10x the corpus. This script measures that
flat-cost curve directly: synthesize scaled corpora with
`bench_scale.synthesize` (multi-file layout at every point), build an
index per scale, then time appending the SAME fixed batch to each.
A leak of index size into the append path (e.g. a rewrite-on-append
regression, or a meta stamp that scans data pages instead of footers)
prints a rising curve; the contract prints a flat one.

Timing protocol matches bench_scale.time_query's spirit: one untimed
warm-up append (JIT/codegen; appended rows are removed between reps by
rebuilding the index), then best-of-3.

Run on an otherwise-idle box:  python scripts/measure_append_scaling.py
Prints a JSON line; the conclusion lives in BASELINE.md.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import bench_scale  # noqa: E402
from airline_data_pipeline_spark.io.readers import table  # noqa: E402
from airline_data_pipeline_spark.operators import dedup, similarity  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
FACTORS = (1, 3, 10)
REPS = 3


def fixed_batches(spark):
    """The SAME append batch at every scale: the base sf0.1 embeddings
    (2k vectors, ids offset out of the synthesized range) and the base
    documents (5k docs, ids offset likewise)."""
    emb = table(spark, BASE, "embeddings").select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    docs = table(spark, BASE, "documents").withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    return emb, docs


def main() -> None:
    spark = get_spark("append_scaling")
    results: dict[str, dict[int, float]] = {"ivf_append": {}, "minhash_append": {}}
    sizes: dict[int, dict[str, int]] = {}
    scratch: list[str] = []
    try:
        for factor in FACTORS:
            sf_dir = tempfile.mkdtemp(prefix=f"appscale_data{factor}_")
            scratch.append(sf_dir)
            bench_scale.synthesize(spark, BASE, sf_dir, factor)
            emb_batch, doc_batch = fixed_batches(spark)
            e = table(spark, sf_dir, "embeddings").select(
                "vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias(
                    "embedding"
                ),
            )
            d = table(spark, sf_dir, "documents")
            sizes[factor] = {"embeddings": e.count(), "documents": d.count()}

            best_ivf = math.inf
            best_mh = math.inf
            for rep in range(REPS + 1):  # rep 0 is the untimed warm-up
                ivf_dir = tempfile.mkdtemp(prefix=f"appscale_ivf{factor}_")
                mh_dir = tempfile.mkdtemp(prefix=f"appscale_mh{factor}_")
                # fresh index per rep: append mutates the artifact, so a
                # timed rep must start from the un-appended state
                similarity.write_ivf_index(e, ivf_dir, n_centroids=16)
                dedup.write_minhash_index(d, mh_dir, num_hashes=32, bands=16)
                t0 = time.perf_counter()
                similarity.append_to_ivf_index(emb_batch, ivf_dir)
                t_ivf = time.perf_counter() - t0
                t0 = time.perf_counter()
                dedup.append_to_minhash_index(doc_batch, mh_dir)
                t_mh = time.perf_counter() - t0
                if rep > 0:
                    best_ivf = min(best_ivf, t_ivf)
                    best_mh = min(best_mh, t_mh)
                # free each rep's indexes immediately — at factor 10 a
                # full-size IVF+MinHash pair per rep would otherwise
                # stack up to ~8x one index of disk before the final
                # cleanup (review r11)
                shutil.rmtree(ivf_dir, ignore_errors=True)
                shutil.rmtree(mh_dir, ignore_errors=True)
            results["ivf_append"][factor] = round(best_ivf, 3)
            results["minhash_append"][factor] = round(best_mh, 3)
    finally:
        for p in scratch:
            shutil.rmtree(p, ignore_errors=True)

    def fit(times: dict[int, float], lo: int, hi: int) -> float:
        return round(
            math.log(times[hi] / times[lo]) / math.log(hi / lo), 2
        )

    out = {
        "protocol": f"fixed batch appended to {FACTORS}-scaled indexes, "
        f"best-of-{REPS} after warm-up, fresh index per rep",
        "index_rows": sizes,
        "append_sec": results,
        "exponents_1x_3x": {k: fit(v, 1, 3) for k, v in results.items()},
        "exponents_3x_10x": {k: fit(v, 3, 10) for k, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
