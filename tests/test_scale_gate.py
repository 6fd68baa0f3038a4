"""Scaling-exponent regression gate (VERDICT r7 prescription #4).

The round-7 scale campaign (`bench_scale.py`, BENCH_SCALE_r07.json)
caught two real 100 TB pathologies — fixed-width SRP buckets going
quadratic and single-file scans serializing onto one core — but ran by
hand. This test re-fits the cheap end of that campaign (1x/3x of the
sf0.1 corpus) every CI run and asserts the fitted exponent of each
operator with a KNOWN quadratic failure mode stays sub-linear, so the
next fixed-width index or single-file layout regression fails a test
instead of hanging a 15-minute task.

Exponent = log(t_3x / t_1x) / log(3), best-of-3 timings after a
warm-up run (r10: was best-of-2; see bench_scale.time_query for the
load-resistance rationale), with one retry-on-trip re-measure before
asserting (`_gate`). The fixed per-query overhead (scheduling, Arrow setup)
DEFLATES the fit at this interval — r7's campaign measured -0.1..0.2
here for the linear operators — so the ceilings have real headroom
against noise while a quadratic candidate explosion (pairs x9 at 3x,
exponent ~2) blows well past them. Thresholds are per-operator
ceilings, not targets; see BASELINE.md "Scale gate" for the history.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pytest

from tests.conftest import require_sf

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Operators whose candidate-generation stage can go quadratic if index
# width stops tracking corpus size (the exact failure class the r7
# campaign caught). Per-op ceilings, calibrated from BENCH_SCALE_r07's
# own 1x->3x interval fits (minhash -0.12, knn_lsh 0.07, simhash 0.17)
# plus r8 re-measurements of THIS test in isolation: ngram's 1x point
# runs ~0.65-0.73 s inside the 5-query gate (vs ~1.4 s inside the
# 14-query campaign), so its gate-measured exponent sits at 0.73-0.81
# — near-linear between these noisy sub-2 s points, NOT a candidate
# explosion (a quadratic prints ~1.7-2.0 here: pairs x9 at 3x). Its
# ceiling is therefore 1.2. Scaled-bits embedding dedup measured
# ~0.8-1.0 on this interval even though its 3x->10x fit is 0.58,
# because its absolute 1x time sits on the index-build floor — so its
# ceiling is 1.35. All ceilings are quadratic-detectors, not
# linearity assertions; see BASELINE.md "Scale gate" for history.
GATED = {
    "minhash_dedup_count": 0.8,
    "ngram_jaccard_pairs": 1.2,
    "simhash_near_dups": 0.8,
    "knn_lsh": 0.8,
    "embedding_dedup_clusters_scaled_bits": 1.35,
    # ExactSubstr spans: hot-hash join risk; measured 0.64 on 1x->3x
    # (0.10 on 3x->10x) at the r8 calibration run
    "duplicate_span_stats": 1.2,
    # cross-corpus gate: same bucket-collision quadratic class as
    # minhash; r8 calibration measured -0.05 on 1x->3x, 0.35 on
    # 3x->10x (2.72/2.57/3.91 s)
    "incremental_minhash_dedup": 0.8,
    # survivor selection rides the minhash pair graph + one
    # cluster-sized window; a pair-graph explosion (the minhash
    # failure class) or a cluster-size blowup in the window would
    # both surface here. r8 campaign measured -0.03 on 1x->3x,
    # 0.01 on 3x->10x (1.67/1.60/1.61 s)
    "canonical_doc_selection": 0.8,
    # the composed corpus-prep lineage: its semi-join dedup stage would
    # shuffle full text if the survivor set ever stopped broadcasting,
    # and the pack window would serialize if (split, shard) degenerated
    # to one partition. The r8 campaign printed a 1.15 top-interval fit
    # for it under 25-query session pressure; the fresh-JVM re-measure
    # with the same time_query protocol reads 3.11/1.98/3.13 s at
    # 1x/3x/10x (exponent 0.38 on 3x->10x), and a stage-by-stage noop
    # decomposition at 10x shows every increment flat (gate +1.0 s,
    # dedup +1.5 s, tokens +0.4 s, pack/rollup ~0) — the campaign point
    # was ambient, not the query. In THIS gate's context (9 queries,
    # warm JVM, both points multi-file temp dirs) calibration read
    # 1.27 -> 3.39 s, fit 0.9 — the same sub-2 s overhead-floor noise
    # band as ngram/scaled-bits, so the ceiling follows their shape:
    # 1.3 still trips on a quadratic (>=1.7) while tolerating the
    # measured spread (0.38-0.9 across three protocols).
    "corpus_prep_end_to_end": 1.3,
    # round-11 (VERDICT r10 #2): the label-vote audit is LINEAR by
    # design (fixed 500-vector eval slice x corpus, campaign exponent
    # 1.03 at the top interval) — the only op where ~1.0 is the
    # CORRECT reading. The regression this gate exists to catch is the
    # eval side silently stopping to broadcast (or the slice becoming
    # a corpus fraction), which turns the brute scorer corpus x corpus
    # — quadratic, printing >= 1.7 here. Ceiling 1.3: linear passes
    # with the family's usual overhead-deflation headroom, quadratic
    # trips. r11 calibration with the gate protocol: 2.09 -> 2.86 s at
    # 1x -> 3x, exponent 0.28 (the fixed fan_out/scheduling floor
    # deflates the by-design 1.0, same shape as every other gated op;
    # the lsh variant read 5.06 -> 5.98 s, exponent 0.15, at its
    # guaranteed-recall settings).
    "knn_label_vote": 1.3,
    # round-11: CCNet head/middle/tail tiling. The campaign reads it
    # ~linear-with-corpus (0.97 top-interval, BENCH_SCALE_r11) — as
    # designed: the per-language NTILE window scales with rows. The
    # gated failure class is the window key degenerating (one hot
    # language serializing the whole corpus onto one NTILE task →
    # super-linear wall). Gate calibration: 1.37 -> 2.11 s at 1x->3x,
    # exponent 0.39 (overhead-deflated like its siblings); ceiling
    # follows the family shape — 1.3 trips on a degenerate window,
    # tolerates the linear design.
    "perplexity_bucket_mix": 1.3,
    # round-9: 13-rule Gopher repetition audit. Unit volume is 9x the
    # token stream with partitioning-aligned aggs — expected ~linear;
    # the failure class here is a hot (doc,kind,unit) reducer if a
    # degenerate doc floods one key (bounded per-doc, so it shouldn't).
    # Ceiling follows the sub-5 s overhead-floor band shape: trips on a
    # quadratic (>=1.7), tolerates warm-JVM noise. r9 calibration in
    # THIS gate read 5.11 -> 4.32 s at 1x->3x (exponent -0.15: the
    # window+stack pipeline's fixed cost dominates at these sizes).
    "gopher_repetition_stats": 1.3,
    # round-12: IVF-PQ probe. The gated failure class is candidate
    # blowup — the ADC stage losing its broadcast or the cell IN-list
    # prune (plan-asserted separately) would turn candidate scoring
    # corpus × corpus instead of batch × probed-cells. The full row
    # pays a build + codebook fit + O(index) encode + probe per rep,
    # all floor-dominated at gate sizes: the r12 targeted campaign
    # (BENCH_SCALE_r12.json) read 5.18/6.03/5.40 s at 1×/3×/10×
    # (top-interval exponent −0.09); in-gate calibration read −0.13.
    # Ceiling follows the family shape — 1.3 trips on a quadratic,
    # tolerates the flat lifecycle floor.
    "knn_via_pq_ivf_index": 1.3,
    # round-13 (VERDICT r12 #3): the reband row's failure class is the
    # signature recompute going shingle-shuffle-bound (signatures must
    # aggregate shingle-LOCALLY from the stored sets — a re-shingle or
    # a payload shuffle would scale with text bytes, not ids) or the
    # new-generation buckets write amplifying. The r13 targeted
    # campaign (BENCH_SCALE_r13.json) read 4.28/4.53/5.04 s at
    # 1×/3×/10× — top-interval exponent 0.09, squarely in the
    # lifecycle-row band (refit −0.09, PQ −0.09..0.02, retraction
    # 0.01). Ceiling follows the family shape: 1.3 trips on a
    # shuffle-bound recompute, tolerates the build-dominated floor.
    # The OTHER r13-campaigned rows stay ungated deliberately:
    # streaming_ann_annotate_pq / streaming_state_migration are
    # trigger-floor-dominated stream replays (measured 0.12 / −0.02 —
    # the floor, not a scalable stage, is their cost) and the fsck
    # rows are rename-dominated repairs of injected states (0.20 /
    # 0.01) whose data-touching stage IS the already-gated gate/probe.
    "dedup_gate_after_reband": 1.3,
    # round-13's real campaign catch: the SRP-artifact gate rows at
    # their REGISTRY settings (n_bits=2 x 24 tables, guaranteed recall
    # for oracle parity) are the fixed-width LSH quadratic in gate
    # form — measured 2.08 at 1x/3x/10x (BASELINE.md "SRP gate at
    # fixed width"). The gated entry is therefore the PRODUCTION dial
    # (bits tracking n, the bench_embedding_dedup recipe, inherited by
    # the whole admit loop through the index meta) — same shape and
    # ceiling as its embedding_dedup_clusters_scaled_bits sibling: a
    # returned quadratic prints >= 1.7 here, the overhead-floor band
    # stays under 1.35.
    "embedding_gate_via_index_scaled_bits": 1.35,
    # round-14 (VERDICT r13 #4): the admit LOOP at the same production
    # dial — the sink inherits scaled bits through the index meta for
    # both reference generations, so a dial regression (fixed-width
    # fallback, meta not inherited) turns every trigger's gate
    # quadratic. r13 campaign: 18.46/21.26 s at 1x/3x (exponent 0.13 —
    # four trigger floors + index build dominate this interval; the
    # quadratic class prints >= 1.7). Ceiling matches its two
    # scaled-bits siblings.
    "vector_admit_loop_scaled_bits": 1.35,
    # round-15 (VERDICT r14 #5): the skew-guard-ON shape — the r14
    # campaign's direct A/B (BENCH_SCALE_r14: ON exponent 0.94 vs OFF
    # 1.24 on a 20%-boilerplate corpus, 1.6x faster at 10x and
    # growing) is the measured case for the guard's broadcast
    # anti-join; this entry keeps it from silently degrading back to
    # the unguarded |hot-bucket|x|batch| pair blowup, whose term grows
    # x9 per tripling while the guarded shape adds only the ledger
    # refresh. r15 in-gate calibration at 1x->3x (interleaved with the
    # OFF twin on the same synthesized dirs): ON 4.39->4.72 s,
    # exponent 0.07; OFF 3.32->5.80 s, exponent 0.51 — the OFF blowup
    # term is floor-deflated at gate sizes, so this exponent entry is
    # the CATASTROPHIC detector (an uncapped quadratic prints >= 1.7)
    # while the guard's skip SEMANTICS are pinned deterministically by
    # tests/test_fsck.py::test_hot_bucket_ledger_skips_boilerplate_
    # and_guards (a silently-disabled anti-join fails that count-based
    # test long before it moves this fit). Ceiling matches the
    # scaled-bits family.
    "embedding_gate_skew_guard_on": 1.35,
}


def _fit(timings: dict[int, dict[str, float]], names) -> dict[str, float]:
    return {
        name: round(
            math.log(max(timings[3][name], 1e-9) / max(timings[1][name], 1e-9))
            / math.log(3),
            2,
        )
        for name in names
    }


def _measure_pairs(spark, fns, names, dirs) -> dict[int, dict[str, float]]:
    """One measurement round with each operator's 1x and 3x points
    taken BACK-TO-BACK (1x, then immediately 3x), not factor-grouped.

    Why (VERDICT r15 #1 — the r16 hardening): the old protocol timed
    ALL ops at 1x first, then ALL at 3x, so ambient load arriving
    during the (minutes-long) 3x half inflated every exponent at once
    — the retry then re-measured under the same load window and the
    gate flaked red on genuinely green plans (the r15 driver run).
    With per-op pairs, a load window spanning the pair inflates both
    points and largely CANCELS out of the fitted ratio; a window
    shorter than a pair is absorbed by time_query's best-of-3 min."""
    import bench_scale

    t: dict[int, dict[str, float]] = {1: {}, 3: {}}
    for name in names:
        for factor in (1, 3):
            t[factor][name] = bench_scale.time_query(
                spark, fns[name], dirs[factor]
            )
    return t


def _gate(spark, label, synthesize, fns, ceilings):
    """Measure interleaved 1x/3x pairs, fit, and assert — with ONE
    retry-on-trip: any op whose first fit breaches its ceiling is
    re-measured fresh (a full extra interleaved pair — new warm-up,
    new best-of-3 per point) and the refit uses the MIN per (factor,
    op) across both rounds. Rationale (VERDICT r9 #1, hardened per
    VERDICT r15 #1): ambient load on this shared box only ever
    INFLATES a wall reading, so the min over all measurements of the
    same point is the estimator that converges on the true cost —
    six reps per point across the two rounds. A genuine quadratic
    (pairs x9 at 3x, exponent ~1.7-2.0) is a property of the PLAN:
    its true 3x/1x ratio is what the minima converge TO, so
    min-combining cannot mask it (tests/test_scale_gate_estimator.py
    pins both directions with planted timings). Both rounds print so
    the fit history survives in the report either way."""
    scratch: list[str] = []
    dirs: dict[int, str] = {}
    try:
        for factor in (1, 3):
            sf_dir = tempfile.mkdtemp(prefix=f"spark_graft_{label}{factor}_")
            scratch.append(sf_dir)
            # factor=1 goes through synthesize too so both points share
            # the multi-file layout (single-file scans serialize — the
            # other r7 pathology; see bench_scale.synthesize docstring)
            synthesize(spark, BASE, sf_dir, factor)
            dirs[factor] = sf_dir
        # the SAME per-point measurement protocol as the by-hand
        # campaign (shared bench_scale.time_query), interleaved per op
        timings = _measure_pairs(spark, fns, list(ceilings), dirs)
        exponents = _fit(timings, ceilings)
        # always visible with -s / in the failure report: the fit
        # history is the point of the gate, not just pass/fail
        print(f"\n{label} timings: {timings}\n{label} exponents: {exponents}")
        offenders = {
            n: (e, ceilings[n]) for n, e in exponents.items() if e >= ceilings[n]
        }
        if offenders:
            retry = _measure_pairs(spark, fns, list(offenders), dirs)
            combined = {
                factor: {
                    name: min(timings[factor][name], retry[factor][name])
                    for name in offenders
                }
                for factor in (1, 3)
            }
            refit = _fit(combined, offenders)
            print(
                f"{label} RETRY timings: {retry}\n"
                f"{label} RETRY combined-min exponents: {refit}"
            )
            offenders = {
                n: (e, ceilings[n]) for n, e in refit.items() if e >= ceilings[n]
            }
        assert not offenders, (
            f"super-linear scaling regression at 1x->3x of {BASE}, "
            f"reproduced on a fresh re-measure with min-combined points "
            f"(exponent, ceiling): {offenders}; first-round timings: {timings}"
        )
    finally:
        for d in scratch:
            shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_dedup_ann_scaling_exponents_stay_sublinear(spark):
    require_sf(BASE)
    import bench_scale

    reg_fns = dict(bench_scale.EXTRA_FAMILY)
    from airline_data_pipeline_spark.queries.suite import registry

    reg = registry()
    for name in GATED:
        if name not in reg_fns:
            reg_fns[name] = reg[name].fn

    _gate(spark, "scale-gate", bench_scale.synthesize, reg_fns, GATED)


# Relational (join/agg/window) shapes with a known blowup class: a dim
# that stops broadcasting flips revenue_by_nation's star joins to SMJ
# chains; a salt that stops spreading re-concentrates the skewed key;
# an interval join whose range predicate degenerates goes cartesian.
# Ceilings are quadratic detectors calibrated like GATED's: the
# overhead floor deflates 1x->3x fits between sub-second points (r8
# campaign interval fits: pricing -0.41, revenue 0.07, shipping 0.27,
# sessionize 0.10, salted -0.04, range_join 0.15), while a cartesian
# or per-key-state blowup prints >= 1.7. Calibration run of THIS test:
# revenue 0.78->0.84 s (0.06), salted 0.37->0.34 s (-0.09), range_join
# 0.79->0.90 s (0.11) — 42 s wall including the two synth passes.
RELATIONAL_GATED = {
    "revenue_by_nation": 1.3,
    "salted_agg_order_totals": 1.3,
    "range_join_views_after_purchase": 1.3,
}


@pytest.mark.slow
def test_relational_scaling_exponents_stay_sublinear(spark):
    require_sf(BASE)
    import bench_scale

    from airline_data_pipeline_spark.queries.suite import registry

    reg = registry()
    fns = {name: reg[name].fn for name in RELATIONAL_GATED}
    _gate(
        spark, "relational-gate", bench_scale.synthesize_relational,
        fns, RELATIONAL_GATED,
    )
