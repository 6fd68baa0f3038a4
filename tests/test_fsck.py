"""fsck verbs for the stored indexes (VERDICT r12 #4): construct each
documented crash state — including real crash-injection between the
swap steps of a live verb — and assert fsck (a) reports it, (b) with
clean=True restores a gate/probe-identical index, (c) reports nothing
on a canonical artifact."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from airline_data_pipeline_spark.io.readers import table
from airline_data_pipeline_spark.io import writers
from airline_data_pipeline_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return table(spark, SF, "documents").select("doc_id", "text", "source")


def _emb(spark):
    return table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _gate_result(spark, idx, inc):
    kept = dedup.dedup_minhash_against_index(inc, idx, threshold=0.7)
    return sorted(r["doc_id"] for r in kept.select("doc_id").collect())


def _probe_result(spark, idx, q):
    from airline_data_pipeline_spark.operators.topk import top_k_per_group

    return sorted(
        (r["query_id"], r["neighbor_id"])
        for r in top_k_per_group(
            similarity.ivf_index_scores(q, idx, nprobe=16),
            ["query_id"], "score", 5,
            ascending=False, tiebreakers=["neighbor_id"],
        ).collect()
    )


def test_fsck_reports_nothing_on_canonical_indexes(spark, tmp_path):
    d = _docs(spark)
    mh = str(tmp_path / "mh_clean")
    dedup.write_minhash_index(
        d.filter(F.col("source") == "src0"), mh, num_hashes=32, bands=16
    )
    assert dedup.fsck_minhash_index(spark, mh).count() == 0

    e = _emb(spark)
    ivf = str(tmp_path / "ivf_clean")
    similarity.write_ivf_index(e, ivf, n_centroids=16)
    similarity.add_pq_to_ivf_index(spark, ivf, m=16, ksub=16)
    assert similarity.fsck_ivf_index(spark, ivf).count() == 0


def test_minhash_fsck_repairs_every_documented_state(spark, tmp_path):
    """One index accumulates ALL the minhash crash states at once:
    a live table missing mid-swap, inert tmp/park residue, an orphan
    buckets generation, orphan shingle rows, and lying bucket rows.
    fsck(clean=False) only reports; fsck(clean=True) repairs; the
    repaired index gates identically to a pristine twin."""
    d = _docs(spark)
    ref = d.filter(F.col("source") == "src0")
    inc = d.filter(F.col("source") != "src0")
    idx = str(tmp_path / "mh_broken")
    twin = str(tmp_path / "mh_twin")
    for p in (idx, twin):
        dedup.write_minhash_index(ref, p, num_hashes=32, bands=16)
    want = _gate_result(spark, twin, inc)

    # state 1: interrupted swap on shingles — live dir gone, the
    # complete staged layout still at its tmp name (the disaster
    # window inside replace_parquet_dir's double rename)
    os.rename(idx + "/shingles", idx + "/shingles__compacting")
    # state 2: inert residue beside an intact table + an orphan
    # buckets generation from a crashed reband
    shutil.copytree(idx + "/meta", idx + "/meta__rebanding")
    shutil.copytree(idx + "/buckets", idx + "/buckets_g9")
    # state 3: orphan shingle rows (an append crashed after its
    # shingles-first write) — fake docs never banded into buckets
    fake = spark.createDataFrame(
        [(900001, "orphan shingle doc one two three"),
         (900002, "another orphan shingle doc four five")],
        "doc_id long, text string",
    )
    dedup.shingle_sets(fake, "text", "doc_id", 3).write.mode("append").parquet(
        idx + "/shingles__compacting"
    )
    # state 4: lying bucket rows (ids in buckets with no shingle set)
    spark.read.parquet(idx + "/buckets").limit(4).withColumn(
        "doc_id", F.col("doc_id") + F.lit(800000)
    ).write.mode("append").parquet(idx + "/buckets")

    report = dedup.fsck_minhash_index(spark, idx, clean=False)
    rows = {(r["component"], r["action"]) for r in report.collect()}
    assert ("shingles", "would finish swap (clean=False)") in rows
    assert any(a == "would delete (clean=False)" for _, a in rows)
    # report-only pass touched nothing: live shingles still missing
    assert not os.path.exists(idx + "/shingles")

    cleaned = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    actions = {r["action"] for r in cleaned}
    assert "finished interrupted swap (renamed in)" in actions
    assert "rewrote table without orphan ids" in actions
    assert "deleted" in actions
    issues = " | ".join(r["issue"] for r in cleaned)
    assert "orphan shingle rows" in issues
    assert "lying bucket rows" in issues
    assert not any(r["action"].startswith("FATAL") for r in cleaned)

    # canonical now: empty re-run, no debris, gate-identical to twin
    assert dedup.fsck_minhash_index(spark, idx).count() == 0
    assert [n for n in os.listdir(idx) if "__" in n or n == "buckets_g9"] == []
    assert _gate_result(spark, idx, inc) == want


def test_minhash_fsck_recovers_crash_injected_retraction(spark, tmp_path):
    """Real crash injection between the swap steps: a retraction's
    buckets table swap is interrupted AFTER parking the live dir
    (live missing, old layout parked, new layout staged). fsck must
    FINISH the swap — completing the verb, not unwinding it — so the
    gate equals a fully-retracted index."""
    d = _docs(spark)
    ref = d.filter(F.col("source").isin("src0", "src1"))
    inc = d.filter(~F.col("source").isin("src0", "src1"))
    retract = d.filter(F.col("source") == "src1").select("doc_id")
    idx = str(tmp_path / "mh_crash")
    twin = str(tmp_path / "mh_crash_twin")
    for p in (idx, twin):
        dedup.write_minhash_index(ref, p, num_hashes=32, bands=16)
    dedup.retract_from_minhash_index(spark, twin, retract)
    want = _gate_result(spark, twin, inc)

    real = writers.replace_parquet_dir

    def crash_after_park(spark_, tmp, live):
        _, fs, P = writers.hadoop_fs(spark_, live)
        assert fs.rename(P(live), P(live + "__replaced"))
        raise RuntimeError("injected crash inside the swap")

    orig = writers.replace_parquet_dir
    writers.replace_parquet_dir = crash_after_park
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            dedup.retract_from_minhash_index(spark, idx, retract)
    finally:
        writers.replace_parquet_dir = orig
    assert not os.path.exists(idx + "/buckets")  # the disaster window

    cleaned = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    assert any(
        r["component"] == "buckets"
        and r["action"] == "finished interrupted swap (renamed in)"
        for r in cleaned
    )
    # buckets now fully retracted; shingles never rewrote (crash came
    # first), so the retracted ids linger as orphan shingles — fsck
    # must have swept those too (the inert half of the crash ordering)
    assert any("orphan shingle rows" in r["issue"] for r in cleaned)
    assert dedup.fsck_minhash_index(spark, idx).count() == 0
    assert _gate_result(spark, idx, inc) == want
    assert real is writers.replace_parquet_dir


def test_ivf_fsck_repairs_every_documented_state(spark, tmp_path):
    """The ANN side: interrupted cells swap, ledger drift, inert
    residue, and an incomplete (never-stamped) PQ artifact — repaired
    to a probe-identical, canonical index."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf_broken")
    twin = str(tmp_path / "ivf_twin")
    for p in (idx, twin):
        similarity.write_ivf_index(e, p, n_centroids=16)
    want = _probe_result(spark, twin, q)

    # interrupted cells swap: live gone, staged layout complete
    os.rename(idx + "/cells", idx + "/cells__compacting")
    # ledger drift: meta stamped with a wrong row count
    md = spark.read.parquet(idx + "/meta").first().asDict()
    similarity._write_meta(
        spark, idx, int(md["n_centroids"]), int(md["dims"]),
        n_rows=int(md["n_rows"]) + 7, fit_gen=md.get("fit_gen") or 0,
    )
    # inert residue + incomplete PQ artifact (encode crashed before
    # the pqmeta stamp: codebooks/pqcodes landed, pqmeta never did)
    shutil.copytree(idx + "/centroids", idx + "/centroids__refitting")
    shutil.copytree(idx + "/centroids", idx + "/codebooks")
    shutil.copytree(idx + "/centroids", idx + "/pqcodes__encoding")

    report = similarity.fsck_ivf_index(spark, idx, clean=False).collect()
    assert any(
        r["component"] == "cells"
        and r["action"] == "would finish swap (clean=False)"
        for r in report
    )
    assert not os.path.exists(idx + "/cells")

    cleaned = similarity.fsck_ivf_index(spark, idx, clean=True).collect()
    actions = {r["action"] for r in cleaned}
    assert "finished interrupted swap (renamed in)" in actions
    assert "re-stamped meta" in actions
    assert "deleted" in actions
    issues = " | ".join(r["issue"] for r in cleaned)
    assert "row-ledger drift" in issues
    assert "incomplete PQ artifact" in issues
    assert not any(r["action"].startswith("FATAL") for r in cleaned)

    assert similarity.fsck_ivf_index(spark, idx).count() == 0
    assert [n for n in os.listdir(idx) if "__" in n] == []
    assert not os.path.exists(idx + "/codebooks")
    assert _probe_result(spark, idx, q) == want
    # the repaired ledger feeds the PQ guard: a fresh encode must
    # stamp a consistent artifact first try
    similarity.add_pq_to_ivf_index(spark, idx, m=16, ksub=16)
    pm = spark.read.parquet(idx + "/pqmeta").first()
    assert pm["n_rows"] == spark.read.parquet(idx + "/meta").first()["n_rows"]


def test_ivf_fsck_reports_stale_pq_without_touching_it(spark, tmp_path):
    """A stale-but-complete PQ artifact (rows appended after the
    encode) is REPORT-ONLY: fsck must name the re-encode fix, not
    delete or 'repair' an artifact whose staleness the probe guard
    already surfaces loudly."""
    e = _emb(spark)
    idx = str(tmp_path / "ivf_stale_pq")
    similarity.write_ivf_index(
        e.filter(F.col("vec_id") % 2 == 0), idx, n_centroids=8
    )
    similarity.add_pq_to_ivf_index(spark, idx, m=16, ksub=16)
    similarity.append_to_ivf_index(e.filter(F.col("vec_id") % 2 == 1), idx)

    rows = similarity.fsck_ivf_index(spark, idx, clean=True).collect()
    assert len(rows) == 1
    assert rows[0]["component"] == "pqmeta"
    assert rows[0]["action"].startswith("REPORT-ONLY")
    assert "n_rows" in rows[0]["detail"]
    # artifact untouched: still present, still loudly stale
    assert os.path.exists(idx + "/pqmeta")
    with pytest.raises(ValueError, match="re-run add_pq_to_ivf_index"):
        similarity.ivf_pq_index_scores(
            e.filter(F.col("vec_id") < 3), idx, nprobe=8, rerank=50
        ).collect()


def test_fsck_missing_table_with_no_recovery_is_fatal(spark, tmp_path):
    d = _docs(spark).filter(F.col("source") == "src0")
    idx = str(tmp_path / "mh_gone")
    dedup.write_minhash_index(d, idx, num_hashes=32, bands=16)
    shutil.rmtree(idx + "/shingles")
    rows = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    assert any(
        r["component"] == "shingles" and r["action"].startswith("FATAL")
        for r in rows
    )


def test_srp_fsck_and_retraction_crash_recovery(spark, tmp_path):
    """The SRP artifact's fsck + retraction, crash-injected like the
    minhash test: a retraction's buckets swap is interrupted after
    parking (live missing, staged layout complete), plus orphan vector
    rows and lying bucket rows injected directly. One
    fsck_srp_index(clean=True) pass finishes the swap and sweeps both
    orphan classes; the repaired index gates identically to a twin
    retracted without the crash."""
    from pyspark.sql import functions as F

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity

    e = table(spark, SF, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    ref = e.filter(F.col("label").isin(0, 1))
    inc = e.filter(F.col("label") >= 2)
    retract = e.filter(F.col("label") == 1).select("vec_id")
    idx = str(tmp_path / "srp_crash")
    twin = str(tmp_path / "srp_twin")
    for p in (idx, twin):
        similarity.write_srp_index(ref, p, dims=64, n_bits=2, n_tables=24)
    similarity.retract_from_srp_index(spark, twin, retract)

    def gate_ids(root):
        return sorted(
            r["vec_id"]
            for r in similarity.embedding_gate_against_index(
                inc, root, threshold=0.45, round_digits=4
            ).collect()
        )

    want = gate_ids(twin)

    crash = {"n": 0}
    orig = writers.replace_parquet_dir

    def crash_after_park(spark_, tmp, live):
        _, fs, P = writers.hadoop_fs(spark_, live)
        assert fs.rename(P(live), P(live + "__replaced"))
        raise RuntimeError("injected crash inside the swap")

    writers.replace_parquet_dir = crash_after_park
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            similarity.retract_from_srp_index(spark, idx, retract)
    finally:
        writers.replace_parquet_dir = orig
    assert not os.path.exists(idx + "/buckets")

    # extra injected states: lying bucket rows + inert residue
    shutil.copytree(idx + "/meta", idx + "/meta__stamping")

    report = similarity.fsck_srp_index(spark, idx, clean=False)
    assert any(
        r["component"] == "buckets"
        and r["action"] == "would finish swap (clean=False)"
        for r in report.collect()
    )
    cleaned = similarity.fsck_srp_index(spark, idx, clean=True).collect()
    actions = {r["action"] for r in cleaned}
    assert "finished interrupted swap (renamed in)" in actions
    issues = " | ".join(r["issue"] for r in cleaned)
    assert "orphan vector rows" in issues  # retracted ids' vectors linger
    assert not any(r["action"].startswith("FATAL") for r in cleaned)

    assert similarity.fsck_srp_index(spark, idx).count() == 0
    assert [n for n in os.listdir(idx) if "__" in n] == []
    assert gate_ids(idx) == want


def test_srp_retraction_noop_and_list_form(spark, tmp_path):
    from pyspark.sql import functions as F

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity

    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    idx = str(tmp_path / "srp_edges")
    similarity.write_srp_index(e, idx, dims=64, n_bits=2, n_tables=24)
    before = spark.read.parquet(idx + "/vectors").count()
    similarity.retract_from_srp_index(spark, idx, [])
    assert spark.read.parquet(idx + "/vectors").count() == before
    similarity.retract_from_srp_index(spark, idx, [0, 1, 2])
    v = spark.read.parquet(idx + "/vectors")
    assert v.count() == before - 3
    assert v.filter(F.col("vec_id").isin(0, 1, 2)).count() == 0
    b = spark.read.parquet(idx + "/buckets")
    assert b.filter(F.col("vec_id").isin(0, 1, 2)).count() == 0


def test_hot_bucket_ledger_skips_boilerplate_and_guards(spark, tmp_path):
    """refresh_hot_buckets + skip_hot: a boilerplate-flooded bucket
    (many near-identical reference docs) lands in the ledger; gating
    with skip_hot=True ADMITS a new doc whose only collisions are in
    hot buckets (the documented recall-for-bounded-cost trade), while
    the plain gate drops it. A high-threshold refresh yields an empty
    ledger and a gate identical to plain; skip_hot without a ledger
    raises; a reband deletes the ledger (old bucket space)."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    ref_rows = [(i, boiler) for i in range(40)] + [
        (100 + i, f"unique reference document number {i} with words {i * 7}")
        for i in range(10)
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(900, boiler), (901, "a completely unrelated incoming document")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh_hot")
    dedup.write_minhash_index(ref, idx, num_hashes=32, bands=16)

    with pytest.raises(ValueError, match="refresh_hot_buckets first"):
        dedup.dedup_minhash_against_index(batch, idx, skip_hot=True)

    n_hot = dedup.refresh_hot_buckets(spark, idx, hot_threshold=8)
    assert n_hot > 0
    plain = {
        r["doc_id"]
        for r in dedup.dedup_minhash_against_index(
            batch, idx, threshold=0.7
        ).collect()
    }
    assert plain == {901}  # the boilerplate twin drops
    skipped = {
        r["doc_id"]
        for r in dedup.dedup_minhash_against_index(
            batch, idx, threshold=0.7, skip_hot=True
        ).collect()
    }
    assert skipped == {900, 901}  # hot-bucket collisions skipped: admitted

    # high threshold -> empty ledger -> identical to the plain gate
    assert dedup.refresh_hot_buckets(spark, idx, hot_threshold=10_000) == 0
    same = {
        r["doc_id"]
        for r in dedup.dedup_minhash_against_index(
            batch, idx, threshold=0.7, skip_hot=True
        ).collect()
    }
    assert same == plain

    # fsck is clean with a ledger present; reband deletes it
    assert dedup.fsck_minhash_index(spark, idx).count() == 0
    dedup.reband_minhash_index(spark, idx, num_hashes=32, bands=8)
    assert not os.path.exists(idx + "/hotbuckets")


def test_fsck_never_installs_uncommitted_staging(spark, tmp_path):
    """ADVICE r13 #1 — the repair tool must not cause data loss: with
    live missing, a PARK present, and an INCOMPLETE staged layout (no
    _SUCCESS: a crash-mid-write residue), fsck must delete the residue
    and restore the park — never rename the incomplete dir in. And
    with MULTIPLE committed staged layouts the recovery is ambiguous:
    FATAL, everything left untouched."""
    d = _docs(spark)
    ref = d.filter(F.col("source") == "src0")
    inc = d.filter(F.col("source") != "src0")
    idx = str(tmp_path / "mh_uncommitted")
    dedup.write_minhash_index(ref, idx, num_hashes=32, bands=16)
    want = _gate_result(spark, idx, inc)

    # crash-mid-write residue: an ALPHABETICALLY-FIRST staging dir with
    # part files but no _SUCCESS (sorts before the park's restore), and
    # the good copy parked — the exact ADVICE scenario
    os.rename(idx + "/shingles", idx + "/shingles__replaced")
    shutil.copytree(idx + "/shingles__replaced", idx + "/shingles__compacting")
    os.remove(idx + "/shingles__compacting/_SUCCESS")

    cleaned = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    by_action = {r["action"] for r in cleaned}
    assert "restored park" in by_action
    assert not any(a.startswith("FATAL") for a in by_action)
    issues = " | ".join(r["issue"] for r in cleaned)
    assert "incomplete staged layout" in issues
    assert not os.path.exists(idx + "/shingles__compacting")
    assert _gate_result(spark, idx, inc) == want
    assert dedup.fsck_minhash_index(spark, idx).count() == 0

    # two COMMITTED staged layouts for one missing table: ambiguous
    os.rename(idx + "/shingles", idx + "/shingles__compacting")
    shutil.copytree(idx + "/shingles__compacting", idx + "/shingles__retracting")
    report = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    fatal = [r for r in report if r["action"].startswith("FATAL")]
    assert fatal and "ambiguous" in fatal[0]["action"]
    # untouched: both staged layouts still on disk, nothing installed
    assert os.path.exists(idx + "/shingles__compacting")
    assert os.path.exists(idx + "/shingles__retracting")
    assert not os.path.exists(idx + "/shingles")
    # resolve by hand (keep one), then fsck finishes the swap
    shutil.rmtree(idx + "/shingles__retracting")
    cleaned = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    assert any(
        r["action"] == "finished interrupted swap (renamed in)" for r in cleaned
    )
    assert _gate_result(spark, idx, inc) == want


def test_fsck_detects_stale_generation_hot_ledger(spark, tmp_path):
    """ADVICE r13 #2 — a reband whose ledger sweep crashed leaves a
    hotbuckets ledger keyed on the OLD bucket space. The gate's
    skip_hot refuses it loudly; fsck detects and (clean=True) deletes
    it; a refreshed ledger then passes both."""
    d = _docs(spark)
    ref = d.filter(F.col("source") == "src0")
    inc = d.filter(F.col("source") != "src0")
    idx = str(tmp_path / "mh_stale_ledger")
    dedup.write_minhash_index(ref, idx, num_hashes=32, bands=16)
    dedup.refresh_hot_buckets(spark, idx, hot_threshold=0)
    assert spark.read.parquet(idx + "/hotbuckets").count() > 0

    # reband bumps banding_gen to 1 and deletes the ledger; simulate
    # the crashed sweep by saving and restoring the old-space ledger
    shutil.copytree(idx + "/hotbuckets", str(tmp_path / "ledger_saved"))
    dedup.reband_minhash_index(spark, idx, num_hashes=32, bands=8)
    assert not os.path.exists(idx + "/hotbuckets")
    shutil.copytree(str(tmp_path / "ledger_saved"), idx + "/hotbuckets")

    with pytest.raises(ValueError, match="banding_gen"):
        dedup.dedup_minhash_against_index(inc, idx, skip_hot=True)

    report = dedup.fsck_minhash_index(spark, idx, clean=False).collect()
    assert any("stale hot-bucket ledger" in r["issue"] for r in report)
    assert os.path.exists(idx + "/hotbuckets")  # report-only
    cleaned = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    assert any(
        r["issue"].startswith("stale hot-bucket ledger")
        and r["action"].startswith("deleted")
        for r in cleaned
    )
    assert not os.path.exists(idx + "/hotbuckets")
    assert dedup.fsck_minhash_index(spark, idx).count() == 0

    # refreshed ledger carries the new generation and gates fine
    dedup.refresh_hot_buckets(spark, idx, hot_threshold=0)
    dedup.dedup_minhash_against_index(inc, idx, skip_hot=True).count()
    assert dedup.fsck_minhash_index(spark, idx).count() == 0


def test_fsck_tolerates_empty_shingle_sets(spark, tmp_path):
    """ADVICE r13 #3 — a doc whose shingle set is EMPTY produces no
    bucket rows by design (`_banded_buckets` has nothing to explode;
    the built-in shingler's whole-doc fallback avoids the state, but a
    foreign writer or a stricter shingler lands it). fsck must not
    report such rows as orphans forever, and a real repair must keep
    them."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "tiny"), (3, "long enough document to shingle fine")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh_short_docs")
    dedup.write_minhash_index(docs, idx, num_hashes=32, bands=16, shingle_k=3)
    # the state as a stricter shingler would land it: indexed rows with
    # empty shingle sets and (correctly) no bucket rows
    spark.createDataFrame(
        [(4,), (5,)], "doc_id long"
    ).select("doc_id", F.array().cast("array<bigint>").alias("__sh")).write.mode(
        "append"
    ).parquet(idx + "/shingles")
    sh = spark.read.parquet(idx + "/shingles")
    assert sh.filter(F.size("__sh") == 0).count() == 2
    # never-crashed index: no perpetual orphan alarm
    assert dedup.fsck_minhash_index(spark, idx).count() == 0

    # inject a REAL orphan (interrupted append), repair, and check the
    # empty-set rows survived the rewrite
    spark.createDataFrame(
        [(900001, [123456789, 987654321])], "doc_id long, __sh array<bigint>"
    ).write.mode("append").parquet(idx + "/shingles")
    cleaned = dedup.fsck_minhash_index(spark, idx, clean=True).collect()
    assert any("orphan shingle rows" in r["issue"] for r in cleaned)
    sh2 = spark.read.parquet(idx + "/shingles")
    assert sh2.filter(F.col("doc_id") == 900001).count() == 0
    assert sh2.filter(F.size("__sh") == 0).count() == 2


def test_ivf_fsck_centroid_restamp_keeps_preledger_nrows_null(spark, tmp_path):
    """ADVICE r13 #4 — a centroid-only restamp on a pre-ledger
    artifact (n_rows NULL) must keep n_rows NULL (the footer-recount
    upgrade path), not stamp 0 and create the very drift fsck exists
    to repair."""
    e = _emb(spark)
    idx = str(tmp_path / "ivf_preledger")
    similarity.write_ivf_index(e, idx, n_centroids=16)
    md = spark.read.parquet(idx + "/meta").first().asDict()
    # regress the artifact to pre-ledger (n_rows NULL) with centroid
    # drift: meta claims one fewer centroid than the table has
    spark.createDataFrame(
        [(int(md["n_centroids"]) - 1, int(md["dims"]), None,
          int(md.get("fit_gen") or 0))],
        "n_centroids int, dims int, n_rows long, fit_gen int",
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/meta__tmp")
    writers.replace_parquet_dir(spark, idx + "/meta__tmp", idx + "/meta")

    cleaned = similarity.fsck_ivf_index(spark, idx, clean=True).collect()
    assert any("centroid-count drift" in r["issue"] for r in cleaned)
    md2 = spark.read.parquet(idx + "/meta").first().asDict()
    assert md2["n_centroids"] == int(md["n_centroids"])
    # the repair must NOT have introduced row-ledger drift
    assert similarity.fsck_ivf_index(spark, idx).count() == 0


def test_srp_fsck_recovers_crash_injected_retraction(spark, tmp_path):
    """VERDICT r13 #8 — the SRP matrix entry's crash-compose property,
    matching its two siblings: a retraction's buckets swap is
    interrupted AFTER parking the live dir (live missing, old layout
    parked, new layout staged+committed). fsck must FINISH the swap —
    completing the verb, not unwinding it — sweep the retracted ids'
    now-orphan vector rows, and leave an index that gates exactly like
    one retracted without the crash; the next retraction runs clean."""
    e = _emb(spark).withColumn(
        "label", (F.col("vec_id") % 4).cast("int")
    )
    ref = e.filter(F.col("label").isin(0, 1))
    inc = e.filter(F.col("label") >= 2)
    retract = e.filter(F.col("label") == 1).select("vec_id")
    idx = str(tmp_path / "srp_crash")
    twin = str(tmp_path / "srp_crash_twin")
    for p in (idx, twin):
        similarity.write_srp_index(ref, p, dims=64, n_bits=2, n_tables=24)
    similarity.retract_from_srp_index(spark, twin, retract)

    def gate(root):
        return sorted(
            r["vec_id"]
            for r in similarity.embedding_gate_against_index(
                inc, root, threshold=0.45, round_digits=4
            ).collect()
        )

    want = gate(twin)

    def crash_after_park(spark_, tmp, live):
        _, fs, P = writers.hadoop_fs(spark_, live)
        assert fs.rename(P(live), P(live + "__replaced"))
        raise RuntimeError("injected crash inside the swap")

    orig = writers.replace_parquet_dir
    writers.replace_parquet_dir = crash_after_park
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            similarity.retract_from_srp_index(spark, idx, retract)
    finally:
        writers.replace_parquet_dir = orig
    assert not os.path.exists(idx + "/buckets")  # the disaster window

    cleaned = similarity.fsck_srp_index(spark, idx, clean=True).collect()
    assert any(
        r["component"] == "buckets"
        and r["action"] == "finished interrupted swap (renamed in)"
        for r in cleaned
    )
    # buckets fully retracted; vectors never rewrote (crash came first)
    # -> the retracted ids linger as inert orphan vectors, swept here
    assert any("orphan vector rows" in r["issue"] for r in cleaned)
    assert similarity.fsck_srp_index(spark, idx).count() == 0
    assert gate(idx) == want

    # compose: a FURTHER retraction on the repaired index runs clean
    more = e.filter(F.col("label") == 2).select("vec_id")
    similarity.retract_from_srp_index(spark, idx, more)
    similarity.retract_from_srp_index(spark, twin, more)
    assert similarity.fsck_srp_index(spark, idx).count() == 0
    assert gate(idx) == gate(twin)


def test_maintain_stored_index_composes_and_is_invisible(spark, tmp_path):
    """Round-14 maintenance orchestrator: one pass runs exactly the
    verbs whose triggers hold — fsck first, compaction on file-count
    pressure, IVF hot-cell split + stale-PQ re-encode, ledger refresh
    — and the pass is BEHAVIOR-INVISIBLE (gate/probe results identical
    before and after) and idempotent (a second run reports only
    skips plus the always-safe ledger refresh)."""
    from airline_data_pipeline_spark.functions.numeric import round_half_up
    from airline_data_pipeline_spark.operators.maintenance import (
        maintain_stored_index,
    )
    from airline_data_pipeline_spark.operators.topk import top_k_per_group

    with pytest.raises(ValueError, match="kind must be"):
        maintain_stored_index(spark, str(tmp_path), "bogus")

    # ---- minhash: compaction pressure + existing ledger ----
    d = _docs(spark)
    ref = d.filter(F.col("source") == "src0")
    batch = d.filter(F.col("source") == "src1")
    inc = d.filter(~F.col("source").isin("src0", "src1"))
    idx = str(tmp_path / "maint_mh")
    dedup.write_minhash_index(ref, idx, num_hashes=32, bands=16, num_files=24)
    dedup.append_to_minhash_index(batch, idx, num_files=24)
    dedup.refresh_hot_buckets(spark, idx, hot_threshold=64)
    before = _gate_result(spark, idx, inc)

    report = maintain_stored_index(
        spark, idx, "minhash", max_files_per_table=32
    )
    actions = {a for _, a, _ in report}
    assert "compacted" in actions and "refreshed ledger" in actions
    assert not any(a.startswith("fsck") for a in actions)  # was canonical
    assert _gate_result(spark, idx, inc) == before
    # skip_hot path still healthy after the pass (gen-stamped ledger)
    dedup.dedup_minhash_against_index(inc, idx, skip_hot=True).count()

    report2 = maintain_stored_index(
        spark, idx, "minhash", max_files_per_table=32
    )
    assert {a for _, a, _ in report2} == {
        "compaction skipped", "refreshed ledger"
    }

    # ---- IVF: crash residue + file pressure + hot cells + stale PQ,
    # all settled in one pass ----
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 3)
    ivf = str(tmp_path / "maint_ivf")
    similarity.write_ivf_index(
        e.filter(F.col("vec_id") % 2 == 0), ivf,
        n_centroids=4, files_per_cell=2,
    )
    similarity.add_pq_to_ivf_index(spark, ivf, m=16, ksub=64)
    similarity.append_to_ivf_index(e.filter(F.col("vec_id") % 2 == 1), ivf)
    shutil.copytree(ivf + "/meta", ivf + "/meta__stamping")  # crash residue

    def probe_all_top5(root):
        rounded = similarity.ivf_pq_index_scores(
            q, root, nprobe=99, rerank=150
        ).select(
            "query_id", "neighbor_id",
            round_half_up(F.col("score"), 4).alias("score"),
        )
        return sorted(
            (r["query_id"], r["neighbor_id"], r["score"])
            for r in top_k_per_group(
                rounded, ["query_id"], "score", 5, tiebreakers=["neighbor_id"]
            ).collect()
        )

    exact_scored = similarity.brute_force_scores(e, q).select(
        "query_id", "neighbor_id",
        round_half_up(F.col("score"), 4).alias("score"),
    )
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in top_k_per_group(
            exact_scored, ["query_id"], "score", 5, tiebreakers=["neighbor_id"]
        ).collect()
    )
    report = maintain_stored_index(
        spark, ivf, "ivf", max_files_per_table=4,
        max_cell_fraction=0.2, pq_params={"m": 16, "ksub": 64},
    )
    actions = {a for _, a, _ in report}
    assert "compacted" in actions
    assert "split hot cells" in actions
    assert "re-encoded stale PQ artifact" in actions
    assert any(a.startswith("fsck") for a in actions)  # the residue
    assert similarity.fsck_ivf_index(spark, ivf).count() == 0
    assert probe_all_top5(ivf) == exact  # PQ serving restored, exact

    # ---- SRP: first ledger materialization on demand ----
    srp = str(tmp_path / "maint_srp")
    similarity.write_srp_index(e, srp, dims=64, n_bits=8, n_tables=4)
    report = maintain_stored_index(
        spark, srp, "srp", ensure_hot_ledger=True, hot_threshold=64
    )
    assert any(a == "materialized ledger" for _, a, _ in report)
    assert os.path.exists(srp + "/hotbuckets")


def test_finish_cell_split_replaces_old_cell_when_subcell_zero_empty(
    spark, tmp_path
):
    """ADVICE r15 (medium): Lloyd refinement can strand sub-cell 0 —
    which reuses the split cell's id — with ZERO rows, so partitionBy
    writes no ``cell=<old>`` dir into the stage. The finisher must
    still replace the live old-cell dir (with an empty one), or every
    hot-cell row ends up duplicated (old dir + new sub-cell dirs), the
    ledger drifts, and probe-all returns duplicate neighbors. Both
    drive paths covered: the direct split-time finisher and a
    fsck-resumed finish. A lingering per-cell swap park is swept by
    the same pass (ADVICE r15 low #3)."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)

    def break_index(idx):
        """Stage a split of the hottest cell where ALL rows landed in
        the NEW sub-cell (sub-cell 0 empty), model committed."""
        cells = spark.read.parquet(idx + "/cells")
        c = int(
            cells.groupBy("cell").count()
            .orderBy(F.desc("count"), "cell").first()["cell"]
        )
        cents = spark.read.parquet(idx + "/centroids")
        new_id = cents.count()
        stage = f"{idx}/cellsplit__staging_{c}"
        (
            cells.filter(F.col("cell") == c)
            .select("neighbor_id", "__cv")
            .withColumn("cell", F.lit(new_id))
            .write.mode("overwrite").partitionBy("cell").parquet(stage)
        )
        # commit the model: duplicate centroid c under the new id
        # (dense range kept), stamp meta with the bumped counts
        md = spark.read.parquet(idx + "/meta").first().asDict()
        extra = cents.filter(F.col("cell") == c).select(
            F.lit(new_id).alias("cell"), F.col("vec")
        )
        cents.unionByName(extra).coalesce(1).write.mode(
            "overwrite"
        ).parquet(idx + "/centroids__tmp")
        writers.replace_parquet_dir(
            spark, idx + "/centroids__tmp", idx + "/centroids"
        )
        similarity._write_meta(
            spark, idx, new_id + 1, int(md["dims"]),
            n_rows=int(md["n_rows"]),
            fit_gen=(md.get("fit_gen") or 0) + 1,
        )
        return c, new_id, stage

    for resume_via in ("finisher", "fsck"):
        idx = str(tmp_path / f"ivf_emptysub_{resume_via}")
        similarity.write_ivf_index(e, idx, n_centroids=8)
        want = _probe_result(spark, idx, q)  # nprobe=16 -> probe-all
        n_total = spark.read.parquet(idx + "/cells").count()
        c, new_id, stage = break_index(idx)
        # plant the out-of-stage park the sweep must clear
        shutil.copytree(
            stage + f"/cell={new_id}", f"{idx}/cells/cell={c}__replaced"
        )
        if resume_via == "finisher":
            similarity._finish_cell_split(spark, idx, stage, c)
        else:
            cleaned = similarity.fsck_ivf_index(spark, idx, clean=True)
            rows = cleaned.collect()
            assert any(
                "interrupted cell split" in r["issue"] for r in rows
            )
            assert any(
                "lingering per-cell swap park" in r["issue"] for r in rows
            )
        cells = spark.read.parquet(idx + "/cells")
        assert cells.count() == n_total  # no duplicated rows
        assert cells.filter(F.col("cell") == c).count() == 0
        assert cells.filter(F.col("cell") == new_id).count() > 0
        assert not os.path.exists(f"{idx}/cells/cell={c}__replaced")
        assert not os.path.exists(stage)
        assert similarity.fsck_ivf_index(spark, idx).count() == 0
        assert _probe_result(spark, idx, q) == want


def test_ivf_fsck_sweeps_lingering_replaced_park_standalone(spark, tmp_path):
    """ADVICE r15 low #3, the no-stage case: a cells/cell=N__replaced
    park with NO split stage anywhere (the finish completed, only the
    mandatory park delete failed) must still be reported and swept —
    it corrupts partition-column inference and duplicates rows."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf_park_only")
    similarity.write_ivf_index(e, idx, n_centroids=8)
    want = _probe_result(spark, idx, q)
    n_total = spark.read.parquet(idx + "/cells").count()
    shutil.copytree(idx + "/cells/cell=0", idx + "/cells/cell=0__replaced")

    report = similarity.fsck_ivf_index(spark, idx, clean=False).collect()
    assert any(
        "lingering per-cell swap park" in r["issue"]
        and r["action"] == "would delete (clean=False)"
        for r in report
    )
    assert os.path.exists(idx + "/cells/cell=0__replaced")  # untouched

    cleaned = similarity.fsck_ivf_index(spark, idx, clean=True).collect()
    assert any(
        "lingering per-cell swap park" in r["issue"]
        and r["action"] == "deleted"
        for r in cleaned
    )
    assert not os.path.exists(idx + "/cells/cell=0__replaced")
    assert spark.read.parquet(idx + "/cells").count() == n_total
    assert similarity.fsck_ivf_index(spark, idx).count() == 0
    assert _probe_result(spark, idx, q) == want


def test_ivf_fsck_centroid_drift_restamp_bumps_fit_gen(spark, tmp_path):
    """ADVICE r15 low #2: a refit/split that crashed between its
    centroids swap and its meta stamp leaves centroid-count drift; the
    crashed verb WOULD have bumped fit_gen, so fsck's restamp must too
    — otherwise a PQ artifact encoded against the pre-swap cell layout
    passes the staleness guard and PQ probes silently read codes
    partitioned by dead assignments."""
    e = _emb(spark)
    idx = str(tmp_path / "ivf_gen_drift")
    similarity.write_ivf_index(e, idx, n_centroids=8)
    similarity.add_pq_to_ivf_index(spark, idx, m=16, ksub=16)
    md0 = spark.read.parquet(idx + "/meta").first().asDict()
    # inject the crash state: one extra centroid row, meta unstamped
    cents = spark.read.parquet(idx + "/centroids")
    extra = cents.filter(F.col("cell") == 0).select(
        F.lit(cents.count()).alias("cell"), F.col("vec")
    )
    cents.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        idx + "/centroids__tmp"
    )
    writers.replace_parquet_dir(
        spark, idx + "/centroids__tmp", idx + "/centroids"
    )

    cleaned = similarity.fsck_ivf_index(spark, idx, clean=True).collect()
    assert any(
        "centroid-count drift" in r["issue"]
        and r["action"] == "re-stamped meta with fit_gen bumped"
        for r in cleaned
    )
    # the SAME pass must already see the PQ artifact as stale
    assert any("stale PQ artifact" in r["issue"] for r in cleaned)
    md1 = spark.read.parquet(idx + "/meta").first().asDict()
    assert (md1.get("fit_gen") or 0) == (md0.get("fit_gen") or 0) + 1
    # and the probe guard now fails loudly instead of reading dead codes
    with pytest.raises(ValueError, match="re-run add_pq_to_ivf_index"):
        similarity.ivf_pq_index_scores(
            e.filter(F.col("vec_id") < 3), idx, nprobe=8, rerank=50
        ).collect()
    # a fresh encode against the bumped generation settles everything
    similarity.add_pq_to_ivf_index(spark, idx, m=16, ksub=16)
    assert similarity.fsck_ivf_index(spark, idx).count() == 0


@pytest.mark.parametrize("kind", ["minhash", "ivf", "srp"])
def test_maintenance_crash_between_steps_rerun_converges(
    spark, tmp_path, kind, monkeypatch
):
    """VERDICT r14 #4 — maintain_stored_index composes crash-safe
    verbs, but nothing killed the ORCHESTRATOR between steps. Inject a
    crash right after the compaction step (before split/PQ/ledger), on
    all three kinds, and prove a plain re-run converges: no fsck
    findings, gate/probe results identical to a twin maintained
    without any crash, and the steady state (a further run) reports
    exactly the twin's steady-state actions."""
    from airline_data_pipeline_spark.operators import (
        dedup as dedup_mod,
        similarity as sim_mod,
    )
    from airline_data_pipeline_spark.operators.maintenance import (
        maintain_stored_index,
    )

    e = _emb(spark)
    d = _docs(spark)
    q = e.filter(F.col("vec_id") < 5)
    inc = d.filter(~F.col("source").isin("src0", "src1"))
    vinc = e.filter(F.col("vec_id") % 3 == 2)

    def build(root):
        if kind == "minhash":
            dedup.write_minhash_index(
                d.filter(F.col("source") == "src0"), root,
                num_hashes=32, bands=16, num_files=24,
            )
            dedup.append_to_minhash_index(
                d.filter(F.col("source") == "src1"), root, num_files=24
            )
            dedup.refresh_hot_buckets(spark, root, hot_threshold=10**6)
        elif kind == "ivf":
            similarity.write_ivf_index(
                e.filter(F.col("vec_id") % 2 == 0), root,
                n_centroids=4, files_per_cell=2,
            )
            similarity.add_pq_to_ivf_index(spark, root, m=16, ksub=64)
            similarity.append_to_ivf_index(
                e.filter(F.col("vec_id") % 2 == 1), root
            )
        else:
            similarity.write_srp_index(
                e.filter(F.col("vec_id") % 3 != 2), root,
                dims=64, n_bits=2, n_tables=24, num_files=24,
            )
            similarity.append_to_srp_index(
                e.filter(F.col("vec_id") % 3 == 2).select(
                    "vec_id", "embedding"
                ),
                root,
            )
            similarity.refresh_srp_hot_buckets(
                spark, root, hot_threshold=10**6
            )

    def observe(root):
        if kind == "minhash":
            return _gate_result(spark, root, inc)
        if kind == "ivf":
            return _probe_result(spark, root, q)
        return sorted(
            r["vec_id"]
            for r in similarity.embedding_gate_against_index(
                vinc.select("vec_id", "embedding"), root,
                threshold=0.45, round_digits=4, skip_hot=True,
            ).collect()
        )

    # per-kind compaction caps sized so the trigger actually holds on
    # the fixture: minhash/srp tables land ~32-48 files after the
    # fragmented write + append; the 4-cell IVF lands ~12 (2/cell + the
    # append's), so its cap follows the maintain test's 4.
    # hot_threshold threads through for the ledgered kinds so the
    # refresh keeps the fixture's cold dial and the skip_hot observe
    # stays an EXACT gate (r15 review — symmetric on idx and twin
    # either way, but exact is the stronger equality)
    kwargs = dict(max_files_per_table=16, hot_threshold=10**6)
    if kind == "ivf":
        kwargs = dict(
            max_files_per_table=4,
            max_cell_fraction=0.2,
            pq_params={"m": 16, "ksub": 64},
        )

    idx = str(tmp_path / f"maint_crash_{kind}")
    twin = str(tmp_path / f"maint_twin_{kind}")
    for root in (idx, twin):
        build(root)
    maintain_stored_index(spark, twin, kind, **kwargs)

    # inject: the compaction verb completes its (atomic) work, then
    # the orchestrator dies before the remaining steps run
    victim = {
        "minhash": (dedup_mod, "compact_minhash_index"),
        "ivf": (sim_mod, "compact_ivf_cells"),
        "srp": (sim_mod, "compact_srp_index"),
    }[kind]
    real = getattr(victim[0], victim[1])

    def boom(*a, **k):
        out = real(*a, **k)
        raise RuntimeError("injected crash between maintenance steps")

    monkeypatch.setattr(victim[0], victim[1], boom)
    with pytest.raises(RuntimeError, match="between maintenance steps"):
        maintain_stored_index(spark, idx, kind, **kwargs)
    monkeypatch.undo()

    # plain re-run converges to the twin's state
    maintain_stored_index(spark, idx, kind, **kwargs)
    fsck = {
        "minhash": dedup.fsck_minhash_index,
        "ivf": similarity.fsck_ivf_index,
        "srp": similarity.fsck_srp_index,
    }[kind]
    assert fsck(spark, idx).count() == 0
    assert observe(idx) == observe(twin)
    # steady state: a further run on the recovered index reports
    # exactly what a further run on the never-crashed twin reports
    steady = lambda root: sorted(
        (c, a) for c, a, _ in maintain_stored_index(spark, root, kind, **kwargs)
    )
    assert steady(idx) == steady(twin)


def test_srp_maintenance_reports_occupancy_drift(spark, tmp_path):
    """VERDICT r14 #8 — the SRP family's reband is a rebuild by design,
    so nothing incremental repairs an outgrown dial; the maintenance
    report must therefore TELL the on-call when a rebuild is due:
    stamped n_bits vs the log2(n/250) production target (the measured
    scaled-bits recipe). Report-only — the artifact is untouched."""
    from airline_data_pipeline_spark.operators.maintenance import (
        maintain_stored_index,
    )

    e = _emb(spark)  # 500 vectors -> target n_bits = 2

    drifted = str(tmp_path / "srp_drift")
    similarity.write_srp_index(e, drifted, dims=64, n_bits=8, n_tables=4)
    report = maintain_stored_index(spark, drifted, "srp")
    rows = [r for r in report if r[1] == "occupancy drift: rebuild due"]
    assert len(rows) == 1
    assert "n_bits=8" in rows[0][2] and "target 2" in rows[0][2]
    # report-only: the index still gates, fsck still canonical
    assert similarity.fsck_srp_index(spark, drifted).count() == 0

    fresh = str(tmp_path / "srp_fresh")
    similarity.write_srp_index(e, fresh, dims=64, n_bits=2, n_tables=4)
    report = maintain_stored_index(spark, fresh, "srp")
    assert any(a == "occupancy fresh" for _, a, _ in report)
    assert not any(a == "occupancy drift: rebuild due" for _, a, _ in report)


def test_maintain_threads_split_refine_dial(spark, tmp_path, monkeypatch):
    """r15: the orchestrator's hot-cell split runs at refine_iters=1
    (each Lloyd pass is a full assign+aggregate job over the hot cell,
    and probe-all results are assignment-invariant — the r14 dial on
    the registry split row), and the dial is a caller-visible
    parameter. Captured via the seam rather than re-timed."""
    from airline_data_pipeline_spark.operators import maintenance

    seen = {}
    real = similarity.split_hot_cells

    def capture(spark_, index_dir, **kw):
        seen.update(kw)
        return real(spark_, index_dir, **kw)

    monkeypatch.setattr(similarity, "split_hot_cells", capture)
    e = _emb(spark)
    ivf = str(tmp_path / "maint_dial")
    similarity.write_ivf_index(e, ivf, n_centroids=4)
    maintenance.maintain_stored_index(spark, ivf, "ivf")
    assert seen.get("refine_iters") == 1
    maintenance.maintain_stored_index(spark, ivf, "ivf", split_refine_iters=2)
    assert seen.get("refine_iters") == 2


def test_crash_between_staged_splits_leaves_fsck_convergent(
    spark, tmp_path, monkeypatch
):
    """r15 opt: split_hot_cells now stages EVERY hot cell's layout
    before the sequential commit loop (overlapped independent jobs),
    which widens the window where multiple stage dirs coexist. A crash
    after the FIRST model commit but before its finish must leave:
    the committed stage finishable, every later stage uncommitted (its
    gids exceed the stamped centroid count) and deletable — both via
    one fsck pass — with probe-all exact at every point, and a re-run
    of the verb completing the remaining splits."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 3)
    idx = str(tmp_path / "ivf_multi_split_crash")
    # coarse model + low cap => at least two hot cells (pigeonhole)
    similarity.write_ivf_index(e, idx, n_centroids=4)
    counts = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(idx + "/cells")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    cap = 0.05
    assert sum(1 for n in counts.values() if n > cap * total) >= 2

    exact = _probe_result(spark, idx, q)

    real_finish = similarity._finish_cell_split
    calls = {"n": 0}

    def crash_after_first_commit(spark_, index_dir, stage, old_cell):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before the first finish")
        return real_finish(spark_, index_dir, stage, old_cell)

    monkeypatch.setattr(
        similarity, "_finish_cell_split", crash_after_first_commit
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        similarity.split_hot_cells(spark, idx, max_cell_fraction=cap)
    monkeypatch.setattr(similarity, "_finish_cell_split", real_finish)

    stages = [
        p for p in os.listdir(idx) if p.startswith("cellsplit__staging_")
    ]
    assert len(stages) >= 2  # the widened window actually exercised

    # every crash point keeps all rows probe-all-reachable
    assert _probe_result(spark, idx, q) == exact

    findings = similarity.fsck_ivf_index(spark, idx, clean=True).collect()
    issues = {r["issue"] for r in findings}
    assert "interrupted cell split with committed centroid model" in issues
    assert (
        "cell-split stage from before its model commit "
        "(inert copy; live rows untouched)" in issues
    )
    assert not [
        p for p in os.listdir(idx) if p.startswith("cellsplit__staging_")
    ]
    after = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(idx + "/cells")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(after.values()) == total  # no row lost or duplicated
    assert _probe_result(spark, idx, q) == exact

    # the verb re-run completes the deleted stages' splits and the
    # artifact converges: fsck then reports nothing
    done = similarity.split_hot_cells(spark, idx, max_cell_fraction=cap)
    assert done
    assert similarity.fsck_ivf_index(spark, idx, clean=True).count() == 0
    assert _probe_result(spark, idx, q) == exact
