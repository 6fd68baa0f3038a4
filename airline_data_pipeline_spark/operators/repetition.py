"""Gopher/MassiveText REPETITION rules (Rae et al. 2021, Table A1).

The second half of the MassiveText quality filter (the threshold half
lives in `functions.text.gopher_quality_flags`): a document is dropped
when too much of it is internally repeated — duplicated lines or
paragraphs, one dominant word n-gram, or heavy duplicate n-gram mass.
The published rule set, with its thresholds:

| rule | threshold |
|---|---|
| duplicate line fraction            | 0.30 |
| duplicate paragraph fraction       | 0.30 |
| duplicate line character fraction  | 0.20 |
| duplicate paragraph char fraction  | 0.20 |
| top 2-gram character fraction      | 0.20 |
| top 3-gram character fraction      | 0.18 |
| top 4-gram character fraction      | 0.16 |
| duplicate 5-gram char fraction     | 0.15 |
| duplicate 6-gram char fraction     | 0.14 |
| duplicate 7-gram char fraction     | 0.13 |
| duplicate 8-gram char fraction     | 0.12 |
| duplicate 9-gram char fraction     | 0.11 |
| duplicate 10-gram char fraction    | 0.10 |

The paper leaves the exact character accounting open (overlapping
n-gram occupancy); this implementation pins a deterministic,
oracle-recomputable contract, documented per metric below. Reference
semantics anchor: the quality-filtering stage of
/root/reference/data_processing/process.py (drop-bad-rows before
aggregation), lifted from row-validity to intra-document repetition.

Scale shape (the reason this is an operator, not a scalar Column): the
char-fraction rules need per-(doc, unit) occurrence counts, which a
higher-order-function fold would recompute per element — O(units²)
per document and interpreted, the exact pathology the round-7 SimHash
rewrite removed. Three constructions were A/B-measured at sf0.1:
  1. flatten-of-(kind,unit)-structs, one explode: 18.6 s — the struct
     transform + flatten are interpreted HOFs paying per-element cost
     over ~900 units/doc;
  2. eleven per-kind explode branches unioned: 4.5 s — codegen'd
     generators, but ELEVEN column-pruned scans of the text column
     (11× IO at 100 TB) and 45 interpreted zip_with passes;
  3. SHIPPED: posexplode tokens once, lead(tok, 1..9) over a
     (doc_id, pos) window, stack the 9 widths, filter the ragged
     tail: 2.2 s — ONE scan, one token-sized shuffle, and every
     downstream groupBy (doc, kind, unit) / (doc, kind) / (doc) reuses
     the window's doc_id hash partitioning, so the whole metric
     pipeline after tokenization is shuffle-free and map-side
     combined. Lines/paragraphs ride a second tiny branch (a few
     units per doc).
At 100 TB: THREE column-pruned scans of (id, text) — the token/n-gram
branch, the line/paragraph branch, and the normalized-char base the
fractions divide by (tests/test_plans.py asserts the scan count stays
<= 3) — but only ONE shuffle of the token stream; everything after the
window reuses its doc_id hash partitioning, so the metric pipeline is
map-side combined and exchange-free past tokenization. Collapsing the
three branches onto one physical scan would need a materialization
(persist/checkpoint) of the raw text column — corpus-sized state for
a 3x-IO saving on a column-pruned read; the scan is the cheap part,
so the three-scan form is the intended shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airline_data_pipeline_spark.functions.text import tokens

# (metric column, threshold) — the published Table A1 values.
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)


def gopher_repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document repetition metrics — one row per input row with the
    13 fractions of `GOPHER_REPETITION_THRESHOLDS` (all double, never
    NULL; degenerate/empty/NULL-text docs score 0.0 everywhere).

    Pinned metric contract (each recomputable from first principles by
    a SQL oracle):
    - units: LINES = trimmed non-empty segments of the RAW text split
      on single newlines (exact-match dedup, case preserved);
      PARAGRAPHS = same over blank-line runs (``\\n{2,}``); n-GRAMS =
      overlapping space-joined windows over lowercased whitespace
      tokens (the corpus-wide dedup family's tokenization).
    - dup_{line,para}_frac = (occurrences − distinct) / occurrences:
      the fraction of units that are repeats beyond their first
      appearance (Gopher's "fraction of lines that are duplicates").
    - dup_{line,para}_char_frac = Σ over repeated units of
      (count−1)·len / Σ count·len — the characters an exact unit-dedup
      pass would delete, over total unit characters.
    - top_{n}gram_char_frac = count·len of the most frequent n-gram
      (ties: the longest among the tied-most-frequent) over the doc's
      normalized char length (space-joined lowercased tokens), capped
      at 1.0 (overlapping occurrences can over-count). A top gram that
      occurs only ONCE scores 0 — a gram seen once is not repetition,
      so a fully non-repetitive doc scores 0.0 on every metric.
    - dup_{n}gram_char_frac = Σ over n-grams occurring >1× of
      count·len, over normalized char length, capped at 1.0 (ALL
      occurrences count — repeated mass, not deletable mass).
    """
    carry = list(carry_cols or [])
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.lower(text))
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    paras = F.filter(
        F.transform(F.split(text, r"\n{2,}"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = df.select(
        F.col(id_col),
        *carry,
        F.length(F.array_join(toks, " ")).alias("__norm_chars"),
    )
    # n-gram branch: tokens explode ONCE; lead() builds every width from
    # the same windowed pass; stack emits (kind, unit) rows; a gram is
    # valid only while its last token exists (docs shorter than n words
    # have no n-grams — no whole-doc fallback, so a 3-word doc's
    # dup-5-gram mass is 0, not self-matching)
    from pyspark.sql import Window

    max_n = max(*_TOP_NS, *_DUP_NS)
    tk = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "t0"))
    w = Window.partitionBy(id_col).orderBy("pos")
    led = tk.select(
        id_col,
        "t0",
        *[F.lead("t0", j).over(w).alias(f"t{j}") for j in range(1, max_n)],
    )
    stack_args = []
    for n in (*_TOP_NS, *_DUP_NS):
        stack_args += [
            F.lit(f"g{n}"),
            F.when(
                F.col(f"t{n - 1}").isNotNull(),
                F.concat_ws(" ", *[F.col(f"t{j}") for j in range(n)]),
            ),
        ]
    grams = led.select(
        id_col,
        F.stack(F.lit(len(_TOP_NS) + len(_DUP_NS)), *stack_args).alias(
            "kind", "unit"
        ),
    ).filter(F.col("unit").isNotNull())
    # line/paragraph branch: a handful of units per doc, so the
    # struct-transform + flatten HOF cost is negligible here (it is NOT
    # for the ~900 grams/doc — see the module docstring A/B)
    lp = df.select(
        F.col(id_col),
        F.explode(
            F.flatten(
                F.array(
                    F.transform(
                        lines,
                        lambda u: F.struct(
                            F.lit("line").alias("kind"), u.alias("unit")
                        ),
                    ),
                    F.transform(
                        paras,
                        lambda u: F.struct(
                            F.lit("para").alias("kind"), u.alias("unit")
                        ),
                    ),
                )
            )
        ).alias("u"),
    ).select(id_col, F.col("u.kind").alias("kind"), F.col("u.unit").alias("unit"))
    # Aggregate each branch BEFORE the union: the gram branch inherits
    # the window's HashPartitioning(doc_id), which satisfies every
    # Clustered(doc_id, …) distribution below it — so its per-unit
    # counts AND per-kind rollup run exchange-free; unioning the raw
    # unit streams first would force a units-sized exchange instead.
    # The lp branch pays its own (few-units-per-doc) shuffle.
    def _per_kind(units: DataFrame) -> DataFrame:
        per_unit = units.groupBy(id_col, "kind", "unit").agg(
            F.count(F.lit(1)).alias("c")
        )
        per_unit = per_unit.withColumn("len", F.length("unit"))
        # max(struct(c, len)) = (max count, then max len among the
        # tied) — exactly the documented top-gram tiebreak, in one
        # codegen agg
        return per_unit.groupBy(id_col, "kind").agg(
            F.sum("c").alias("n_units"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.col("len")).alias("tot_chars"),
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(
                    F.lit(0)
                )
            ).alias("dup_all"),
            F.sum(
                F.when(F.col("c") > 1, (F.col("c") - 1) * F.col("len")).otherwise(
                    F.lit(0)
                )
            ).alias("dup_beyond"),
            F.max(F.struct(F.col("c"), F.col("len"))).alias("top"),
        )

    per_kind = _per_kind(grams).unionByName(_per_kind(lp))

    def _k(kind: str, col: str) -> Column:
        return F.max(F.when(F.col("kind") == kind, F.col(col)))

    per_doc = per_kind.groupBy(id_col).agg(
        *[
            agg
            for kind in ("line", "para")
            for agg in (
                _k(kind, "n_units").alias(f"__{kind}_n"),
                _k(kind, "n_distinct").alias(f"__{kind}_d"),
                _k(kind, "tot_chars").alias(f"__{kind}_tc"),
                _k(kind, "dup_beyond").alias(f"__{kind}_db"),
            )
        ],
        *[
            F.max(
                F.when(
                    (F.col("kind") == f"g{n}") & (F.col("top.c") > 1),
                    F.col("top.c") * F.col("top.len"),
                )
            ).alias(f"__g{n}_top")
            for n in _TOP_NS
        ],
        *[_k(f"g{n}", "dup_all").alias(f"__g{n}_da") for n in _DUP_NS],
    )

    def frac(num: Column, den: Column) -> Column:
        return (
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
        ).cast("double")

    def capped(num: Column, den: Column) -> Column:
        return F.least(F.lit(1.0), frac(num, den))

    out = base.join(per_doc, on=id_col, how="left")
    z = F.lit(0)
    metrics = [
        frac(
            F.coalesce(F.col(f"__{k}_n"), z) - F.coalesce(F.col(f"__{k}_d"), z),
            F.coalesce(F.col(f"__{k}_n"), z),
        ).alias(f"dup_{k}_frac")
        for k in ("line", "para")
    ] + [
        frac(
            F.coalesce(F.col(f"__{k}_db"), z), F.coalesce(F.col(f"__{k}_tc"), z)
        ).alias(f"dup_{k}_char_frac")
        for k in ("line", "para")
    ] + [
        capped(F.coalesce(F.col(f"__g{n}_top"), z), F.col("__norm_chars")).alias(
            f"top_{n}gram_char_frac"
        )
        for n in _TOP_NS
    ] + [
        capped(F.coalesce(F.col(f"__g{n}_da"), z), F.col("__norm_chars")).alias(
            f"dup_{n}gram_char_frac"
        )
        for n in _DUP_NS
    ]
    return out.select(id_col, *carry, *metrics)


def gopher_repetition_flags(metrics_df: DataFrame) -> DataFrame:
    """Threshold the 13 metric columns against the published Table A1
    values → one boolean per rule plus `fail_any_repetition`. Kept
    separate from the metric computation so threshold tuning (the
    per-source audit this feeds) never re-runs the corpus scan."""
    out = metrics_df
    fail_cols = []
    for col, thr in GOPHER_REPETITION_THRESHOLDS.items():
        name = f"fail_{col}"
        out = out.withColumn(name, (F.col(col) > F.lit(thr)))
        fail_cols.append(name)
    any_fail = fail_cols[0]
    expr = F.col(any_fail)
    for c in fail_cols[1:]:
        expr = expr | F.col(c)
    return out.withColumn("fail_any_repetition", expr)
