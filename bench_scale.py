"""Scaling benchmark for the dedup/ANN family: measure how the
corpus-sized operators behave ONE ORDER OF MAGNITUDE above the driver's
largest test data, turning the 100 TB plan-shape argument into a
measured scaling exponent.

Synthesizes sf0.3/sf1-sized `documents` and `embeddings` tables by
replicating sf0.1 with per-replica scrambling chosen to preserve each
operator's workload characteristics (so the measurement is a fair
scale-up, not a degenerate one):

- documents: replica k>0 suffixes every token with `_k{k}` — length,
  vocab size per doc, and repetition ratios are preserved within a
  replica, while every shingle differs across replicas, so the
  corpus-wide duplicate RATE stays constant instead of every replica
  being a near-dup of replica 0 (which would blow candidate pairs
  quadratically and measure a different workload).
- embeddings: replica k>0 sign-flips each component by a hash of
  (k, dim). Norms and all WITHIN-replica pairwise cosines are exactly
  preserved (the corpus geometry repeats), while cross-replica cosines
  scramble to ~0 — 10 independent-looking copies of the same cluster
  structure, the realistic shape of a 10× corpus.

A second family (RELATIONAL_FAMILY) scale-fits the join/agg/window
headline queries over factor× lineitem/orders/events with FIXED
dimension tables (`synthesize_relational` docstring) — the other half
of the engine, measured instead of plan-argued.

Usage: python bench_scale.py [--scales 1,3,10] [--families corpus,relational]
Prints ONE JSON line:
  {"metric": "dedup_ann_scaling", "scales": {...},
   "exponents_top_interval": {...}, "relational_scales": {...},
   "relational_exponents_top_interval": {...}}

The per-query scaling exponent is fit as log(t_hi/t_lo)/log(n_hi/n_lo)
over the two largest scales; ~1.0 = linear (what the plans promise),
>1.3 = super-linear blowup worth investigating (hot-bucket caps,
CC iteration growth).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Registry queries timed as-is: their index parameters are
# corpus-size-independent (minhash bands/rows; knn bucket/cell counts
# with a FIXED query set; row-local repetition scoring), so their cost
# should scale ~linearly with corpus size.
FAMILY = [
    "minhash_dedup_count",
    "knn_lsh",
    "knn_ivf",
    "doc_repetition_by_source",
    "tfidf_top_terms",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "corpus_prep_end_to_end",
    "contamination_check_splits",
    "heavy_hitter_tokens",
    # round-8 additions: the new corpus ops (temperature mixing is two
    # cheap scans; the overlap check joins eval shingles against a
    # train set that GROWS with the corpus; the classifier is explode +
    # broadcast-model join + per-doc agg)
    "temperature_source_mix",
    "ngram_overlap_contamination",
    "quality_classifier_scores",
    # ExactSubstr duplicate-span detection: same quadratic-risk class
    # as the bucketed dedups (a boilerplate span repeated corpus-wide
    # is a hot hash key in the occurrences⋈canonical join)
    "duplicate_span_stats",
    # bigram LM gate: the vocabulary (train groupBy + history window)
    # grows with the corpus — the family's only op whose MODEL scales
    # with the data
    "lm_fluency_by_source",
    # cross-corpus incremental gate: BOTH sides (frozen reference and
    # incoming batch) grow with the corpus here — the worst case for
    # the cross-set bucket join, same hot-bucket quadratic risk class
    # as minhash_dedup_count
    "incremental_minhash_dedup",
    # DSIR: two count aggregates + a FIXED 4096-bucket broadcast model
    # + one explode/join/sum scoring scan — expected ~linear
    "dsir_selection_by_source",
    # round-8 close additions: survivor selection rides the same pair
    # graph as minhash (window over cluster-sized groups on top);
    # Gopher rules are a single row-local scan + source agg (expected
    # flat-to-linear); CCNet tiling adds the per-lang NTILE window to
    # the LM-gate shape (vocabulary grows with the corpus)
    "canonical_doc_selection",
    "gopher_rules_stats",
    "perplexity_bucket_mix",
    # blocklist word-filter: same flat row-local-scan + source-agg
    # shape as the Gopher audit
    "blocklist_filter_stats",
    # BPE pair counts: expansion input is the vocab, which the
    # scrambled corpus synthesis barely grows — expect near-flat
    "bpe_pair_counts",
    # source-pair overlap: corpus-sized hashed-shingle distinct, then
    # source-set-bounded work — expect sub-linear like the dedup family
    "source_overlap_matrix",
    # iterative BPE: one corpus-sized word count, then vocab-bounded
    # per-merge work — expect near-flat (vocab grows only via the
    # scrambling suffixes)
    "bpe_merge_steps",
    # kNN label-vote audit: corpus x FIXED-eval-slice brute scoring —
    # linear by design (a fraction-sized sample would be quadratic)
    "knn_label_vote",
    # round-9: 13-rule Gopher repetition audit — one token window pass
    # building all 9 n-gram widths, partitioning-aligned aggs; expect
    # ~linear (unit count is 9x tokens, per-doc state bounded)
    "gopher_repetition_stats",
    # round-10: the last two dedup shapes without campaign history.
    # Winnowing: fingerprint inverted index — same bucket-join class as
    # minhash (hot fingerprint = hot key). Span REMOVAL: cost is
    # O(duplicated tokens) via the occurrences anti-join rebuild — the
    # only dedup op whose work scales with the duplicate mass itself.
    "winnow_fingerprint_pairs",
    "span_removal_stats",
    # round-11: the vote audit's EXERCISED ANN swap — same vote stages,
    # SRP candidate scorer at guaranteed-recall registry settings; at
    # fixed bits the candidate fraction is ~constant so expect the
    # brute form's linear shape minus the broadcast-scorer constant
    # (the production dial is bits tracking corpus growth, like
    # knn_lsh's scaled-bits twin)
    "knn_label_vote_lsh",
    # round-11 lifecycle rows: each times a FULL index round trip per
    # rep (build + append [+ compact] + probe/gate) — the build
    # dominates and is linear in the corpus; the append itself is
    # measured flat separately (scripts/measure_append_scaling.py)
    "knn_via_appended_ivf_index",
    "incremental_dedup_via_merged_index",
    # round-12 lifecycle rows, same build-dominated class as the r11
    # pair above (a FULL artifact round trip per rep): PQ adds the
    # codebook fit (model-sized) + one O(index) encode pass + the
    # ADC-candidates/exact-rerank probe — candidates are batch ×
    # corpus at probe-all, so expect the knn_label_vote linear shape;
    # the refit row pays build + append + an O(index) re-assign pass;
    # the retraction row pays minhash index build + an O(index)
    # anti-join rewrite + the gate
    "knn_via_pq_ivf_index",
    "knn_via_refitted_ivf_index",
    "dedup_gate_after_retraction",
    # round-13 (VERDICT r12 #3): the three rows that shipped after the
    # r12 targeted campaign, plus this round's new lifecycle rows.
    # Reband: low-recall build + ONE shingle-local O(index) signature
    # recompute + gate — the failure class to watch is the recompute
    # going shingle-shuffle-bound or the new-generation write
    # amplifying; expect the build-dominated linear shape.
    "dedup_gate_after_reband",
    # PQ serving: index build + codebook fit + O(index) encode + a
    # 4-trigger stream replay whose per-trigger work is batch-sized —
    # expect linear build+encode over a fixed trigger-floor constant
    "streaming_ann_annotate_pq",
    # retraction (ANN side): build + PQ encode + anti-join rewrite of
    # cells AND pqcodes + probe-all — two O(index) IO passes on top of
    # the build-dominated class
    "knn_via_retracted_ivf_index",
    # fsck rows: build + crash-state injection + one fsck pass (repair
    # is rename-dominated; the orphan check is an id-projected
    # anti-join) + gate/probe — expect the underlying gate/probe shape
    "dedup_gate_after_fsck",
    "knn_via_fsck_recovered_ivf_index",
    # round-13 admit loops + SRP artifact rows. The admit loops' delta
    # side re-hashes everything ADMITTED so far per trigger, so total
    # work is ~linear in corpus (sum over 4 triggers of O(admitted));
    # the failure class to watch is the per-trigger delta gate going
    # pair-quadratic on a hot bucket. SRP gate/retraction rows are the
    # build-dominated lifecycle class (one banding pass + broadcast
    # batch joins / one anti-join rewrite).
    "streaming_ingest_admit_loop",
    "streaming_vector_admit_loop",
    "embedding_gate_via_index",
    "embedding_gate_after_retraction",
    # round-14 rows. Compaction and fold are O(index)/O(delta) IO
    # passes on top of the SRP build-dominated class; the cold-ledger
    # skip_hot gates add one bucket-table groupBy-count (the refresh)
    # to their plain-gate siblings' shape. NOTE these run the registry
    # parity dial (fixed n_bits=2) like their siblings: the known
    # fixed-width quadratic appears at 10x by design — the PRODUCTION
    # dial is the gated scaled-bits entry; compare like with like.
    "embedding_gate_via_compacted_index",
    "embedding_gate_skip_hot_cold_ledger",
    "incremental_dedup_skip_hot_cold_ledger",
    "incremental_dedup_via_folded_index",
    "embedding_gate_via_folded_index",
    # local IVF rebalance: one O(index) count pass + O(hot cell) split
    # work (sub-fit, staged rewrite of the hot cell only) + probe-all;
    # the failure class is the split accidentally rewriting cold cells
    # (locality lost -> refit-shaped O(index) growth)
    "knn_via_split_ivf_index",
    # The r14 maintenance-orchestrator rows are deliberately NOT
    # campaigned: maintain_stored_index composes verbs that are each
    # campaigned above (compaction r11/r13, split r14 at 0.66, PQ
    # encode r12, ledger refresh = one bucket count) and adds only
    # metadata trigger checks (file counts, fit_gen/ledger compares) —
    # no new data-shaped stage exists to fit an exponent to; a
    # campaign would re-measure the sum of its parts. The r15
    # production-cadence composition row
    # (streaming_admit_fold_maintain_gate) stays out for the same
    # reason: admit loop (campaigned r13), fold (r14), maintain
    # (composed, above), one-shot gate (campaigned r11+) — every
    # data-shaped stage already has its own fit.
]


def bench_embedding_dedup(spark, sf_dir):
    """embedding_dedup_clusters with SCALE-APPROPRIATE index sizing.

    The registry query pins n_bits=2 (4 SRP buckets) — the right
    recall/cost point at the driver's 500-2000 vectors, but buckets
    then grow linearly with the corpus and candidate PAIRS
    quadratically: the first run of this harness measured exactly that
    blowup at 10× (a single hot-bucket verify task with ~15 min of
    CPU). An ANN index's width is a function of corpus size — like
    every production LSH deployment, the bucket count must track n.
    Here: n_bits = log2(n / 250) keeps ~250 vectors/bucket at every
    scale (expected pairs per bucket constant, bucket count ∝ n →
    total candidates ~linear), and max_bucket_size=2000 backstops
    skewed buckets. The recall/bits tradeoff (more bits = fewer
    per-table collisions) is the documented LSH dial; n_tables stays
    at the registry's 24.
    """
    import math

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import dedup, similarity

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n = e.count()
    n_bits = max(2, round(math.log2(max(n, 500) / 250)))
    pairs = similarity.cosine_near_dup_pairs(
        e, threshold=0.40, n_bits=n_bits, n_tables=24, max_bucket_size=2000
    ).filter(F.col("cosine") >= 0.45)
    return dedup.connected_components(
        e.select("vec_id"), pairs, id_col="vec_id"
    )


def bench_embedding_gate_index_scaled_bits(spark, sf_dir):
    """embedding_gate_via_index at the PRODUCTION dial: n_bits tracks
    the corpus (log2(n/250), the bench_embedding_dedup recipe), so
    per-bucket occupancy stays ~constant and candidate pairs ~linear.

    Why this variant exists (r13 campaign finding, BASELINE.md "SRP
    gate at fixed width"): the registry row pins n_bits=2 x 24 tables
    — GUARANTEED recall for oracle parity on this weakly-similar
    synthetic corpus — and fixed-width SRP is quadratic by
    construction (4 buckets/table: candidates ~ |ref| x |batch| / 4);
    measured exponent 2.08 at 1x/3x/10x. The production dial trades
    that for per-pair recall exactly like every LSH op in this repo;
    at real near-dup thresholds (cosine >= 0.9) the 24-table miss rate
    at 6 bits is ~6e-6, and the dial is CI-gated here so the quadratic
    can't silently return."""
    import math
    import tempfile

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity
    from airline_data_pipeline_spark.queries.suite import (
        _gate_stats,
        _localized,
    )

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n = e.count()
    n_bits = max(2, round(math.log2(max(n, 500) / 250)))
    ref = e.filter(F.col("label") == 0)
    inc = e.filter(F.col("label") != 0)
    root = tempfile.mkdtemp(prefix="spark_graft_srpscaled_")
    similarity.write_srp_index(
        ref, root, dims=64, n_bits=n_bits, n_tables=24
    )
    kept = similarity.embedding_gate_against_index(
        inc, root, threshold=0.45, round_digits=4
    )
    return _localized(
        spark, _gate_stats(inc, kept, "label", "vecs"), scratch_dirs=(root,)
    )


def bench_vector_admit_loop_scaled_bits(spark, sf_dir):
    """streaming_vector_admit_loop at the production dial: the scaled
    n_bits lands in the index meta at build time and the sink inherits
    it for BOTH reference generations (stored index + admitted delta),
    so one dial fixes the whole loop — the point of params-in-meta."""
    import glob
    import math
    import os
    import shutil
    import tempfile

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity
    from airline_data_pipeline_spark.queries.suite import _localized
    from airline_data_pipeline_spark.streaming.events import (
        read_vectors_stream,
        run_vector_ingest_admit_sink,
    )

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n = e.count()
    n_bits = max(2, round(math.log2(max(n, 500) / 250)))
    ref = e.filter(F.col("label") == 0)
    inc = e.filter(F.col("label") != 0)
    idx = tempfile.mkdtemp(prefix="spark_graft_vadmitsc_idx_")
    src = tempfile.mkdtemp(prefix="spark_graft_vadmitsc_src_")
    out_dir = tempfile.mkdtemp(prefix="spark_graft_vadmitsc_out_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_vadmitsc_ckpt_")
    stage = tempfile.mkdtemp(prefix="spark_graft_vadmitsc_stage_")
    similarity.write_srp_index(ref, idx, dims=64, n_bits=n_bits, n_tables=24)
    for k in range(4):
        part_dir = f"{stage}/b{k}"
        inc.filter(F.col("vec_id") % 4 == k).select(
            "vec_id", "embedding"
        ).coalesce(1).write.mode("overwrite").parquet(part_dir)
        dst = f"{src}/{k:04d}.parquet"
        shutil.move(glob.glob(f"{part_dir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    run_vector_ingest_admit_sink(
        read_vectors_stream(spark, src, max_files_per_trigger=1),
        idx, out_dir, ckpt, threshold=0.45, round_digits=4,
    )
    landed = spark.read.parquet(out_dir + "/batch=*")
    out = landed.agg(F.count(F.lit(1)).alias("n_kept"))
    return _localized(
        spark, out, scratch_dirs=(idx, src, out_dir, ckpt, stage)
    )


def _skewed_gate_run(spark, sf_dir, skip_hot: bool):
    """Shared harness for the r14 skew-guard A/B: a production-dial
    (scaled-bits) SRP gate over a corpus with an INJECTED boilerplate
    cluster — 20% of the reference and 20% of the batch are copies of
    one constant vector (license-header embeddings, the skew the
    hot-bucket ledger exists for). All copies hash to ONE (tbl,
    bucket) key per table, so that bucket's candidate pairs are
    |ref-cluster| x |batch-cluster| ~ n² while every normal bucket
    stays ~constant-occupancy under the scaled dial. The guarded
    variant refreshes the ledger at 4x the expected base occupancy
    and gates with skip_hot=True — the cluster bucket dies at the
    anti-join; the unguarded variant eats the quadratic."""
    import math
    import tempfile

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity
    from airline_data_pipeline_spark.queries.suite import _localized

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n = e.count()
    n_bits = max(2, round(math.log2(max(n, 500) / 250)))
    ref = e.filter(F.col("label") == 0)
    inc = e.filter(F.col("label") != 0)
    n_ref, n_inc = ref.count(), inc.count()
    u = F.array(*[F.lit(1.0 if i == 0 else 0.25) for i in range(64)])

    def boiler(count, id_base):
        return (
            spark.range(count)
            .select(
                (F.col("id") + id_base).alias("vec_id"),
                u.cast("array<double>").alias("embedding"),
            )
        )

    ref_all = ref.select("vec_id", "embedding").unionByName(
        boiler(max(1, n_ref // 5), 1_000_000_000)
    )
    inc_all = inc.select("vec_id", "embedding").unionByName(
        boiler(max(1, n_inc // 5), 2_000_000_000)
    )
    root = tempfile.mkdtemp(prefix="spark_graft_srpskew_")
    similarity.write_srp_index(
        ref_all, root, dims=64, n_bits=n_bits, n_tables=24
    )
    hot = None
    if skip_hot:
        base = max(16, (n_ref + max(1, n_ref // 5)) >> n_bits)
        similarity.refresh_srp_hot_buckets(spark, root, hot_threshold=4 * base)
    kept = similarity.embedding_gate_against_index(
        inc_all, root, threshold=0.45, round_digits=4, skip_hot=skip_hot
    )
    out = kept.agg(F.count(F.lit(1)).alias("n_kept"))
    return _localized(spark, out, scratch_dirs=(root,))


def bench_embedding_gate_skew_guard_off(spark, sf_dir):
    return _skewed_gate_run(spark, sf_dir, skip_hot=False)


def bench_embedding_gate_skew_guard_on(spark, sf_dir):
    return _skewed_gate_run(spark, sf_dir, skip_hot=True)


EXTRA_FAMILY = {
    "embedding_dedup_clusters_scaled_bits": bench_embedding_dedup,
    "embedding_gate_via_index_scaled_bits": bench_embedding_gate_index_scaled_bits,
    "vector_admit_loop_scaled_bits": bench_vector_admit_loop_scaled_bits,
    # r14 skew-guard A/B: same injected-boilerplate corpus, ledger
    # guard on vs off — the measured case for refresh_srp_hot_buckets
    "embedding_gate_skew_guard_off": bench_embedding_gate_skew_guard_off,
    "embedding_gate_skew_guard_on": bench_embedding_gate_skew_guard_on,
}


# Relational (join/agg/window) headline queries, scale-fitted over
# factor× lineitem/orders/events with FIXED dimension tables — the
# other half of the engine, whose 100 TB claim was previously a
# plan-shape argument only. Index-free plans, so the expected fit is
# ~linear minus the per-query overhead floor.
RELATIONAL_FAMILY = [
    "pricing_summary",                 # Q1 scan + 4-group agg
    "revenue_by_nation",               # fact⋈fact⋈dims multi-join
    "shipping_priority",               # Q3 join + top-k
    "sessionize",                      # per-user window gaps
    "salted_agg_order_totals",         # skew-salted two-phase agg
    "range_join_views_after_purchase", # per-user interval join
    # round-13 (VERDICT r12 #3): reads only events, which the
    # relational synthesizer scales — two stream replays + the
    # checkpoint state rebuild between them; the dump is state-sized
    # (watermark horizon), so expect the replay's linear shape over a
    # fixed trigger-floor constant
    "streaming_state_migration",
]

RELATIONAL_DIMS = ["region", "nation", "customer", "supplier", "part"]

N_FILES = 32  # files per synthesized table — see synthesize() docstring


def synthesize(spark, base_dir: str, out_dir: str, factor: int) -> None:
    """Write `factor`× documents.parquet + embeddings.parquet under
    out_dir using the scrambled-replica scheme described above.

    Every scale is written as N_FILES parquet files — INCLUDING
    factor=1 — because the driver's single-file sf0.1 tables are ~15 MB
    and scan as ONE partition (below maxPartitionBytes), which
    serializes every row-local stage onto one core and would make the
    fitted exponents measure single-core arithmetic rather than the
    engine's parallel slope (observed: a 1-task codegen stage pinning
    one core while 31 idle). At 100 TB a table is thousands of files;
    a fixed multi-file layout at every scale point is the
    representative — and comparable — configuration.
    """
    from airline_data_pipeline_spark.io.readers import table

    docs = table(spark, base_dir, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(factor).select(F.col("id").alias("__k"))
    scaled_docs = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__k") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("__k") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1_k"), F.col("__k").cast("string")),
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    scaled_docs.repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = table(spark, base_dir, "embeddings")
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dims = len(emb.select("embedding").first()[0])
    # per-(replica, dim) deterministic sign: +1 when xxhash64(k, i) even
    signs = (
        spark.range(factor)
        .select(F.col("id").alias("__k"))
        .crossJoin(spark.range(dims).select(F.col("id").alias("__i")))
        .withColumn(
            "__s",
            F.when(F.col("__k") == 0, F.lit(1.0)).otherwise(
                F.when(
                    F.pmod(F.xxhash64("__k", "__i"), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
            ),
        )
        .groupBy("__k")
        .agg(F.map_from_entries(F.collect_list(F.struct("__i", "__s"))).alias("__sm"))
    )
    scaled_emb = (
        emb.crossJoin(F.broadcast(signs))
        .select(
            (F.col("vec_id") + F.col("__k") * F.lit(n_vecs)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: (x * F.element_at(F.col("__sm"), i.cast("long"))).cast(
                    "float"
                ),
            ).alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def synthesize_relational(spark, base_dir: str, out_dir: str, factor: int) -> None:
    """Write `factor`× lineitem/orders/events + copied dims under
    out_dir, workload-preserving:

    - orders/lineitem: replica k shifts the ORDER key space by
      k·(max_orderkey+1), so the orders⋈lineitem fanout is preserved
      per replica while part/supplier/customer keys stay unchanged —
      the fact grows over a FIXED dimensional universe, which is how
      real warehouses scale (dims stay broadcast-sized; each dim key
      simply accumulates factor× more fact rows).
    - events: replica k shifts BOTH event_id and user_id spaces — new
      users with the same per-user event density, so sessionize's
      window workload per key and the hot-key skew RATIO are
      preserved (replicating user_ids instead would grow per-key
      state and measure a different workload).
    - dims are byte-copied: identical content at every scale point.

    Facts are written as N_FILES files at EVERY factor for the same
    reason as synthesize(): the fitted exponent must measure the
    parallel slope, not a single-file scan pathology.
    """
    from airline_data_pipeline_spark.io.readers import table

    reps = spark.range(factor).select(F.col("id").alias("__k"))

    o = table(spark, base_dir, "orders")
    key_span = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    o.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("__k") * F.lit(key_span)).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ).repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )

    li = table(spark, base_dir, "lineitem")
    li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("__k") * F.lit(key_span)).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ).repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )

    ev = table(spark, base_dir, "events")
    spans = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    ev_span, user_span = spans[0] + 1, spans[1] + 1
    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("__k") * F.lit(ev_span)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__k") * F.lit(user_span)).alias("user_id"),
        "event_type", "value", "props",
    ).repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    for dim in RELATIONAL_DIMS:
        src = os.path.join(base_dir, f"{dim}.parquet")
        dst = os.path.join(out_dir, f"{dim}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


def time_query(spark, fn, sf_dir: str, reps: int = 3) -> float:
    """THE campaign measurement protocol: one warm-up collect (JIT +
    codegen), then best of `reps` steady-state runs. tests/test_scale_gate
    shares this function so the CI gate and the by-hand campaign can
    never drift into measuring different things.

    Best-of-3 (r10, was best-of-2): ambient load only ever INFLATES a
    wall-clock reading, so the minimum over reps is the estimator that
    converges on the true cost as load comes and goes — one quiet rep
    out of three suffices, where best-of-2 needed one of two and the
    r9 gate flaked red on loaded in-suite runs with genuinely green
    exponents (VERDICT r9 #1). The gate adds a retry-on-trip re-measure
    on top (tests/test_scale_gate.py)."""
    fn(spark, sf_dir).collect()
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        best = min(best, time.monotonic() - t0)
    return best


def time_family(
    spark, sf_dir: str, only: set[str] | None = None
) -> dict[str, float]:
    reg = registry()
    fns = {name: reg[name].fn for name in FAMILY} | EXTRA_FAMILY
    if only is not None:
        fns = {name: fn for name, fn in fns.items() if name in only}
    return {name: round(time_query(spark, fn, sf_dir), 3) for name, fn in fns.items()}


def _fit_exponents(
    results: dict[str, dict[str, float]], scales: list[int], names: list[str]
) -> dict[str, float] | None:
    """log(t_hi/t_lo)/log(n_hi/n_lo) over the two largest scales; None
    with a single scale point (a single --scales value used to crash
    on scales[-2])."""
    if len(scales) < 2:
        return None
    import math

    lo, hi = str(scales[-2]), str(scales[-1])
    ratio = scales[-1] / scales[-2]
    return {
        q: round(
            math.log(max(results[hi][q], 1e-9) / max(results[lo][q], 1e-9))
            / math.log(ratio),
            2,
        )
        for q in names
    }


def main() -> None:
    scales = [
        int(s)
        for s in (sys.argv[sys.argv.index("--scales") + 1] if "--scales" in sys.argv else "1,3,10").split(",")
    ]
    families = [
        f.strip()
        for f in (
            sys.argv[sys.argv.index("--families") + 1]
            if "--families" in sys.argv
            else "corpus,relational"
        ).split(",")
        if f.strip()
    ]
    unknown = set(families) - {"corpus", "relational"}
    if unknown:
        # fail BEFORE the hours-long campaign, not after a silent no-op
        raise SystemExit(
            f"unknown --families {sorted(unknown)}; valid: corpus, relational"
        )
    # --queries a,b,c: restrict either family to a subset — the
    # targeted-campaign path for newly added ops (the full 30+-query
    # campaign stays the per-round default). Unknown names fail fast.
    only: set[str] | None = None
    if "--queries" in sys.argv:
        # guard the value lookup (ADVICE r12): `--queries` as the LAST
        # argv used to raise IndexError instead of the usage message
        qi = sys.argv.index("--queries") + 1
        if qi >= len(sys.argv) or sys.argv[qi].startswith("--"):
            raise SystemExit(
                "--queries needs a comma-separated list of query names"
            )
        only = {q.strip() for q in sys.argv[qi].split(",") if q.strip()}
        if not only:
            raise SystemExit(
                "--queries needs a comma-separated list of query names"
            )
        known = set(FAMILY) | set(EXTRA_FAMILY) | set(RELATIONAL_FAMILY)
        bad = only - known
        if bad:
            raise SystemExit(
                f"unknown --queries {sorted(bad)}; valid names are the "
                f"FAMILY/EXTRA_FAMILY/RELATIONAL_FAMILY entries"
            )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_scale", cpus=int(cpus))
    results: dict[str, dict[str, float]] = {}
    rel_results: dict[str, dict[str, float]] = {}
    scratch: list[str] = []
    reg = registry()
    try:
        for s in scales:
            # factor=1 is ALSO rewritten through synthesize so every
            # scale point shares the N_FILES layout (see docstring)
            if "corpus" in families:
                sf_dir = tempfile.mkdtemp(prefix=f"spark_graft_scale{s}_")
                scratch.append(sf_dir)
                synthesize(spark, BASE_SF_DIR, sf_dir, s)
                results[str(s)] = time_family(spark, sf_dir, only)
            if "relational" in families:
                rel_dir = tempfile.mkdtemp(prefix=f"spark_graft_rel{s}_")
                scratch.append(rel_dir)
                synthesize_relational(spark, BASE_SF_DIR, rel_dir, s)
                rel_results[str(s)] = {
                    name: round(time_query(spark, reg[name].fn, rel_dir), 3)
                    for name in RELATIONAL_FAMILY
                    if only is None or name in only
                }
    finally:
        for d in scratch:
            shutil.rmtree(d, ignore_errors=True)
    out: dict = {
        "metric": "dedup_ann_scaling",
        "unit": "sec",
        "base_sf_dir": BASE_SF_DIR,
    }
    # an --queries set can filter a family to nothing — drop the empty
    # per-scale dicts so the artifact never carries a vacuous
    # scales/exponents block (ADVICE r12)
    results = {s: r for s, r in results.items() if r}
    rel_results = {s: r for s, r in rel_results.items() if r}
    if results:
        out["scales"] = results
        out["exponents_top_interval"] = _fit_exponents(
            results, scales,
            [n for n in [*FAMILY, *EXTRA_FAMILY] if only is None or n in only],
        )
    if rel_results:
        out["relational_scales"] = rel_results
        out["relational_exponents_top_interval"] = _fit_exponents(
            rel_results, scales,
            [n for n in RELATIONAL_FAMILY if only is None or n in only],
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
