"""r15 optimization: self-join key tables derive ONCE.

The candidate generators that self-join a derived key table
(`dedup_minhash`/`minhash_candidates` — banded minhash signatures,
`simhash_near_dups` — SimHash fingerprints, `winnow_shared_pairs` —
winnow fingerprint sets, `exact_jaccard_pairs(prefix_filter=True)` —
prefix postings, `cosine_near_dup_pairs` — SRP buckets) materialize
that table with a lazy localCheckpoint (`_reuse`) so both join sides
read the same blocks instead of re-running the derivation per side
(pre-r15 plans carried two identical Generate→HashAggregate→Exchange
subtrees under every such join; the SRP bucketize additionally ran
its ArrowEvalPython matmul twice).

Two guarantees checked here, per operator:
1. bit-identity: the reused plan returns exactly the rows the
   recompute-per-side plan returns (`_reuse` patched to identity);
2. plan shape: the derivation aggregate no longer appears per side in
   the top-level plan — it lives behind exactly one RDD scan pair.
"""

from __future__ import annotations

import pytest

from airline_data_pipeline_spark.io.readers import table
from airline_data_pipeline_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture
def no_reuse(monkeypatch):
    """Patch both modules' _reuse to identity — the pre-r15 plans."""
    monkeypatch.setattr(dedup, "_reuse", lambda df: df)
    monkeypatch.setattr(similarity, "_reuse", lambda df: df)


def _docs(spark):
    return table(spark, SF, "documents")


def _vecs(spark):
    from pyspark.sql import functions as F

    return table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def test_minhash_candidates_bit_identical(spark, request):
    d = _docs(spark)
    reused = _rows(dedup.minhash_candidates(d, num_hashes=32, bands=16))
    request.getfixturevalue("no_reuse")
    recomputed = _rows(dedup.minhash_candidates(d, num_hashes=32, bands=16))
    assert reused == recomputed


def test_dedup_minhash_bit_identical(spark, request):
    d = _docs(spark)
    reused = _rows(dedup.dedup_minhash(d, threshold=0.7, num_hashes=32, bands=16))
    request.getfixturevalue("no_reuse")
    recomputed = _rows(
        dedup.dedup_minhash(d, threshold=0.7, num_hashes=32, bands=16)
    )
    assert reused == recomputed


def test_simhash_near_dups_bit_identical(spark, request):
    d = _docs(spark)
    reused = _rows(dedup.simhash_near_dups(d, max_hamming=3, portable=True))
    request.getfixturevalue("no_reuse")
    recomputed = _rows(dedup.simhash_near_dups(d, max_hamming=3, portable=True))
    assert reused == recomputed


def test_winnow_shared_pairs_bit_identical(spark, request):
    d = _docs(spark)
    reused = _rows(dedup.winnow_shared_pairs(d, min_shared=2))
    request.getfixturevalue("no_reuse")
    recomputed = _rows(dedup.winnow_shared_pairs(d, min_shared=2))
    assert reused == recomputed


def test_exact_jaccard_prefix_bit_identical(spark, request):
    d = _docs(spark)
    reused = _rows(dedup.exact_jaccard_pairs(d, threshold=0.5, prefix_filter=True))
    request.getfixturevalue("no_reuse")
    recomputed = _rows(
        dedup.exact_jaccard_pairs(d, threshold=0.5, prefix_filter=True)
    )
    assert reused == recomputed


def test_cosine_near_dup_pairs_bit_identical(spark, request):
    e = _vecs(spark)
    kwargs = dict(threshold=0.8, dims=64, n_bits=4, n_tables=8)
    reused = _rows(similarity.cosine_near_dup_pairs(e, **kwargs))
    request.getfixturevalue("no_reuse")
    recomputed = _rows(similarity.cosine_near_dup_pairs(e, **kwargs))
    assert reused == recomputed


def test_minhash_selfjoin_derives_signatures_once(spark):
    """The top-level physical plan must not contain the per-side
    signature-aggregate subtrees any more: the derivation lives behind
    the checkpoint (Scan ExistingRDD on both join sides), so zero
    min(xxhash64(...)) aggregates appear above it."""
    d = _docs(spark)
    plan = (
        dedup.minhash_candidates(d, num_hashes=32, bands=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "min(xxhash64" not in plan, "signature agg re-derived per join side"
    assert "Scan ExistingRDD" in plan


def test_two_sided_cap_bit_identical(spark, request):
    """r16 (VERDICT r15 #5): `cap_hot_buckets_two_sided`'s capped path
    _reuses the unioned banded table — without it each side's banding
    derivation planned 3x (hot-count aggregate, n-split, r-split)."""
    e = _vecs(spark)
    new = e.filter("vec_id % 2 = 1")
    ref = e.filter("vec_id % 2 = 0")
    kwargs = dict(
        threshold=0.45, dims=64, n_bits=2, n_tables=8,
        max_bucket_size=150, round_digits=4,
    )
    reused = _rows(
        similarity.embedding_gate_against_reference(new, ref, **kwargs)
    )
    request.getfixturevalue("no_reuse")
    recomputed = _rows(
        similarity.embedding_gate_against_reference(new, ref, **kwargs)
    )
    assert reused == recomputed


def test_two_sided_cap_derives_banding_once(spark):
    """With a cap set, the gate's top-level plan must carry no
    ArrowEvalPython (the SRP matmul runs once per side BELOW the
    checkpointed union, not once per consumer of the capped table)."""
    e = _vecs(spark)
    plan = (
        similarity.embedding_gate_against_reference(
            e.filter("vec_id % 2 = 1"), e.filter("vec_id % 2 = 0"),
            threshold=0.45, n_bits=2, n_tables=8,
            max_bucket_size=150, round_digits=4,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan, "banding re-derived above the cap"
    assert "Scan ExistingRDD" in plan


def test_srp_selfjoin_bucketizes_once(spark):
    """cosine_near_dup_pairs' top-level plan must carry no per-side
    ArrowEvalPython bucketize: one checkpointed bucket table feeds both
    sides. (The verify join-back reads vectors from the source scan,
    which is not Python-evaluated.)"""
    e = _vecs(spark)
    plan = (
        similarity.cosine_near_dup_pairs(e, threshold=0.8, n_bits=4, n_tables=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan, "SRP bucketize re-derived per join side"
    assert "Scan ExistingRDD" in plan
