"""The stored-index MAINTENANCE ORCHESTRATOR — one executable pass
over the cadence every lifecycle verb's docstring prescribes in prose
("compact on the maintenance cadence", "refresh the ledger after
retractions", "re-run add_pq after a refit"). An on-call engineer (or
a cron'd job at 100 TB) should not need to know which of nine verbs a
given artifact currently needs; `maintain_stored_index` inspects the
artifact and runs exactly the ones whose trigger condition holds:

1. **fsck (clean)** — settle every documented crash state first, so
   the later steps operate on a canonical artifact.
2. **compaction** when any data table's file count exceeds
   ``max_files_per_table`` (the small-file listing-storm pathology
   every append accumulates; kind-specific verbs keep the layouts
   join-/prune-aligned).
3. **IVF local rebalance** (`split_hot_cells`) when a cell exceeds
   ``max_cell_fraction`` of the ledger — the O(hot cell) drift repair.
4. **PQ re-encode** when a PQ artifact exists but is stale
   (fit_gen/row-ledger mismatch — the state split/refit/append leave,
   where every PQ probe already fails loudly).
5. **hot-bucket ledger refresh** (minhash/SRP) when a ledger exists
   (it must track compactions/retractions/appends) or when
   ``ensure_hot_ledger`` asks for first materialization.
   CONTRACT (r15 review): the refresh RE-DIALS the ledger at this
   pass's ``hot_threshold`` — the artifact does not persist the dial
   it was materialized with (an empty cold ledger has no rows to
   carry it on), so a caller that built the ledger at a non-default
   threshold MUST pass the same value here or the refresh silently
   re-thresholds it (e.g. a 10**6 "never hot" dial collapsing to the
   default 64 turns skip_hot gates lossy). Persisting the dial in a
   ledger meta row is the r16 root-cause fix.

Everything here is BEHAVIOR-INVISIBLE by the composed verbs' own
contracts — gates and probe-all results are identical before and
after (driver-checked: `incremental_dedup_via_maintained_index`,
`knn_via_maintained_ivf_index`) — and the function is idempotent: a
second run on a freshly-maintained artifact reports only no-ops (plus
the ledger refresh, which re-runs whenever a ledger exists — one
cheap count pass, always safe, and the conservative default since
every rewrite above can shift bucket occupancies).
Run against a quiesced artifact (the verbs' shared contract); serving
streams ride the swaps via their stale-listing reload.

Returns a driver-sized action report: list of (component, action,
detail) tuples, including the fsck findings it settled.
"""

from __future__ import annotations

from airline_data_pipeline_spark.io.readers import (
    count_parquet_rows,
    read_meta_first,
)


def _file_count(fs, P, path: str) -> int:
    """Recursive parquet part-file count under ``path`` (one level of
    partition dirs is enough for every layout here)."""
    if not fs.exists(P(path)):
        return 0
    total = 0
    for st in fs.listStatus(P(path)):
        name = st.getPath().getName()
        if st.isDirectory():
            total += sum(
                1
                for s in fs.listStatus(st.getPath())
                if s.getPath().getName().startswith("part-")
            )
        elif name.startswith("part-"):
            total += 1
    return total


def maintain_stored_index(
    spark,
    index_dir: str,
    kind: str,
    max_files_per_table: int = 64,
    num_files: int = 32,
    hot_threshold: int = 64,
    ensure_hot_ledger: bool = False,
    max_cell_fraction: float = 0.25,
    split_refine_iters: int = 1,
    pq_params: dict | None = None,
) -> list[tuple[str, str, str]]:
    """One maintenance pass over a stored index artifact. See the
    module docstring for the trigger conditions; ``kind`` is
    ``"minhash"``, ``"ivf"``, or ``"srp"``. ``pq_params`` overrides
    the m/ksub/... kwargs of a triggered PQ re-encode (defaults reuse
    `add_pq_to_ivf_index`'s).

    ``split_refine_iters=1`` (vs `split_hot_cells`' own default of 2)
    is justified for PROBE-ALL / top-k callers: results are invariant
    to the sub-cell assignment because every row stays reachable. A
    low-nprobe caller (probing few cells) gets different
    post-maintenance cell placement — and potentially different recall
    — under 1 pass than 2; such callers should pass
    ``split_refine_iters=2`` explicitly (ADVICE r15)."""
    from airline_data_pipeline_spark.io.writers import hadoop_fs
    from airline_data_pipeline_spark.operators import dedup, similarity

    if kind not in ("minhash", "ivf", "srp"):
        raise ValueError(f"kind must be 'minhash', 'ivf' or 'srp', got {kind!r}")
    _, fs, P = hadoop_fs(spark, index_dir)
    report: list[tuple[str, str, str]] = []

    # 1. settle crash states
    fsck = {
        "minhash": dedup.fsck_minhash_index,
        "ivf": similarity.fsck_ivf_index,
        "srp": similarity.fsck_srp_index,
    }[kind]
    kwargs = {"num_files": num_files} if kind != "ivf" else {}
    for r in fsck(spark, index_dir, clean=True, **kwargs).collect():
        report.append((r["component"], f"fsck: {r['action']}", r["issue"]))

    # 2. compaction on file-count pressure
    if kind == "minhash":
        md = read_meta_first(spark, index_dir + "/meta").asDict()
        gen = md.get("banding_gen") or 0
        bname = "buckets" if not gen else f"buckets_g{gen}"
        tables = [bname, "shingles"]
    elif kind == "ivf":
        tables = ["cells"]
    else:
        tables = ["buckets", "vectors"]
    n_files = {t: _file_count(fs, P, f"{index_dir}/{t}") for t in tables}
    if any(n > max_files_per_table for n in n_files.values()):
        detail = ", ".join(f"{t}: {n} files" for t, n in n_files.items())
        if kind == "minhash":
            dedup.compact_minhash_index(spark, index_dir, num_files=num_files)
        elif kind == "ivf":
            similarity.compact_ivf_cells(spark, index_dir)
        else:
            similarity.compact_srp_index(spark, index_dir, num_files=num_files)
        report.append(("tables", "compacted", detail))
    else:
        report.append((
            "tables", "compaction skipped",
            f"all under {max_files_per_table} files",
        ))

    # 3. IVF local rebalance + 4. PQ re-encode
    if kind == "ivf":
        # split_refine_iters=1, not split_hot_cells' default 2 (r15):
        # each Lloyd pass is one full assign+aggregate job over the hot
        # cell, and probe-all/top-k results are invariant to the
        # assignment (the r14 dial on the registry split row — any
        # sub-centroid placement keeps every row reachable); one pass
        # per cell halves the refine cost of a maintenance sweep
        done = similarity.split_hot_cells(
            spark, index_dir, max_cell_fraction=max_cell_fraction,
            refine_iters=split_refine_iters,
        )
        if done:
            report.append((
                "cells", "split hot cells",
                "; ".join(f"{c} -> {gids}" for c, gids in done),
            ))
        else:
            report.append((
                "cells", "split skipped",
                f"no cell over {max_cell_fraction:.0%} of the ledger",
            ))
        if fs.exists(P(index_dir + "/pqmeta")):
            md = read_meta_first(spark, index_dir + "/meta").asDict()
            pm = read_meta_first(spark, index_dir + "/pqmeta").asDict()
            stale = (pm.get("fit_gen") or 0) != (md.get("fit_gen") or 0) or (
                pm.get("n_rows") or 0
            ) != (md.get("n_rows") or 0)
            if stale:
                similarity.add_pq_to_ivf_index(
                    spark, index_dir, **(pq_params or {})
                )
                report.append((
                    "pq", "re-encoded stale PQ artifact",
                    f"pqmeta fit_gen {pm.get('fit_gen')}/rows "
                    f"{pm.get('n_rows')} vs index {md.get('fit_gen')}/"
                    f"{md.get('n_rows')}",
                ))
            else:
                report.append(("pq", "re-encode skipped", "PQ artifact fresh"))

    # 3b. SRP occupancy-drift report (REPORT-ONLY — VERDICT r14 #8):
    # the SRP family's reband IS a rebuild by design (hyperplanes are
    # seed-derived from n_bits, so no incremental verb can change
    # them), which means nothing on the IVF side's split/refit path
    # tells the on-call when a grown SRP index has outgrown its dial.
    # The production recipe keeps ~250 vectors/bucket with
    # n_bits = log2(n/250) (bench_scale.py's measured scaled-bits
    # dial); when the stamped bits drift from that target the gate's
    # candidate sets grow superlinearly. One vectors count — the same
    # maintenance-cadence cost as the ledger refresh below.
    if kind == "srp":
        import math

        md = read_meta_first(spark, index_dir + "/meta").asDict()
        n = count_parquet_rows(spark, index_dir + "/vectors")
        # EXACTLY bench_scale.py's scaled-bits expression, banker's
        # rounding included: at an exact half-step (n = 250·2^{k+0.5})
        # round-half-even picks the even exponent on both sides, so
        # the report target always equals the dial the production
        # recipe would pick — switching to half-up HERE would make the
        # report disagree with the recipe at those sizes (r15 review)
        target = max(2, round(math.log2(max(n, 500) / 250)))
        stamped = int(md["n_bits"])
        if target != stamped:
            report.append((
                "meta", "occupancy drift: rebuild due",
                f"stamped n_bits={stamped} vs target {target} for "
                f"n={n} (~250 rows/bucket/table); SRP reband = rebuild "
                f"by design — re-run write_srp_index at the target dial",
            ))
        else:
            report.append((
                "meta", "occupancy fresh",
                f"n_bits={stamped} matches target for n={n}",
            ))

    # 5. hot-bucket ledger refresh (tracks every rewrite above)
    if kind in ("minhash", "srp"):
        has_ledger = fs.exists(P(index_dir + "/hotbuckets"))
        if has_ledger or ensure_hot_ledger:
            refresh = (
                dedup.refresh_hot_buckets
                if kind == "minhash"
                else similarity.refresh_srp_hot_buckets
            )
            n_hot = refresh(spark, index_dir, hot_threshold=hot_threshold)
            report.append((
                "hotbuckets",
                "refreshed ledger" if has_ledger else "materialized ledger",
                f"{n_hot} hot buckets at threshold {hot_threshold}",
            ))
        else:
            report.append((
                "hotbuckets", "refresh skipped",
                "no ledger materialized and ensure_hot_ledger=False",
            ))
    return report
