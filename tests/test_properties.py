"""Property-based tests (SURVEY.md §5 #4).

Hypothesis drives the pure-python/DuckDB properties densely; the
Spark-backed keyset property uses one DataFrame and many cursors in a
single session to keep job counts sane."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airline_data_pipeline_spark.operators.pagination import (
    decode_cursor,
    encode_cursor,
    keyset_predicate,
)


# ---------------------------------------------------------------------------
# floor-based rounding: python model == DuckDB's evaluation of sql_round
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=0, max_value=6),
)
def test_sql_round_matches_python_model(x, n):
    """floor(x·10ⁿ+0.5)/10ⁿ is a pure function of the input DOUBLE, so
    any engine evaluating it on the same bits gets the same bits back.

    The value is bound as a PARAMETER, not interpolated into the SQL
    text: a 16-significant-digit literal like 900719925.5173125 parses
    as DECIMAL in DuckDB and the DECIMAL→DOUBLE conversion
    double-rounds (the scaled integer exceeds 2⁵³), yielding an input
    one ulp away from Python's correctly-rounded parse — an artifact of
    literal syntax, not of the formula. Engine queries always feed
    parquet DOUBLE columns, the parameter-binding situation.
    """
    from airline_data_pipeline_spark.functions.numeric import sql_round

    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_round('?', n)}", [x]).fetchone()[0]
    expected = math.floor(x * 10**n + 0.5) / 10**n
    assert got == expected
    con.close()


# ---------------------------------------------------------------------------
# the ACTUAL rounding contract: Spark and DuckDB evaluate the same
# formula on the same doubles → identical bits (grid of adversarial
# half-boundary / large-magnitude / negative values, one Spark job)
# ---------------------------------------------------------------------------
def test_round_half_up_spark_duckdb_parity(spark):
    from airline_data_pipeline_spark.functions.numeric import (
        round_half_up,
        sql_round,
    )

    values = [
        0.0, -0.005, 0.005, 0.015, 0.025, 37704.575, -37704.575,
        2.675, -2.675, 1e-9, 123456789.987654321, -123456789.987654321,
        900719925.5173125, -900719925.5173125, 999999999.9999999,
    ]
    scales = [0, 2, 4, 6]
    rows = [(v,) for v in values]
    df = spark.createDataFrame(rows, "x double")
    got_spark = {
        (r["x"], n): r[f"r{n}"]
        for n in scales
        for r in df.select(
            "x", *[round_half_up(F.col("x"), m).alias(f"r{m}") for m in scales]
        ).collect()
    }
    con = duckdb.connect()
    for v in values:
        for n in scales:
            d = con.execute(f"SELECT {sql_round('?', n)}", [v]).fetchone()[0]
            assert got_spark[(v, n)] == d, (v, n)
    con.close()


# ---------------------------------------------------------------------------
# cross-engine primitives used by the text/dedup oracles: the md5-derived
# 60-bit hash and explicit unicode script ranges are bit/count-identical
# between Spark (Java regex) and DuckDB (RE2)
# ---------------------------------------------------------------------------
def test_portable_hash60_and_unicode_ranges_parity(spark):
    from airline_data_pipeline_spark.functions.text import (
        portable_hash60,
        sql_portable_hash60,
    )

    samples = [
        "hello", "", " ", "the quick brown fox", "ab你好cd", "abЖдcd",
        "abموcd", "ünïcødé", "a:b:c", "123", "\ttabbed\ntext",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: (r["h"], r["cjk"], r["cyr"], r["arab"])
        for r in df.select(
            "s",
            portable_hash60(F.col("s")).alias("h"),
            F.length(F.regexp_replace("s", r"[^一-鿿]", "")).alias("cjk"),
            F.length(F.regexp_replace("s", r"[^Ѐ-ӿ]", "")).alias("cyr"),
            F.length(F.regexp_replace("s", r"[^؀-ۿ]", "")).alias("arab"),
        ).collect()
    }
    con = duckdb.connect()
    for s in samples:
        h, cjk, cyr, arab = con.execute(
            f"""SELECT {sql_portable_hash60('?')},
                       length(regexp_replace(?, '[^一-鿿]', '', 'g')),
                       length(regexp_replace(?, '[^Ѐ-ӿ]', '', 'g')),
                       length(regexp_replace(?, '[^؀-ۿ]', '', 'g'))""",
            [s, s, s, s],
        ).fetchone()
        assert got[s] == (h, cjk, cyr, arab), s
    con.close()


# ---------------------------------------------------------------------------
# cursor encode/decode roundtrip
# ---------------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.dates(),
            st.text(
                alphabet=st.characters(
                    blacklist_characters=":", blacklist_categories=("Cs",)
                ),
                max_size=20,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_cursor_roundtrip(parts):
    cur = encode_cursor(*parts)
    decoded = decode_cursor(cur, len(parts))
    assert decoded == [str(p) for p in parts]


# ---------------------------------------------------------------------------
# keyset predicate == lexicographic tuple comparison (Spark-evaluated)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tuples_df(spark):
    rows = [
        (a, b, c)
        for a in range(4)
        for b in range(4)
        for c in range(4)
    ]
    return spark.createDataFrame(rows, "a int, b int, c int").cache()


def test_keyset_predicate_is_lexicographic(spark, tuples_df):
    all_rows = [(r["a"], r["b"], r["c"]) for r in tuples_df.collect()]
    for cursor in [(0, 0, 0), (1, 2, 3), (3, 3, 3), (2, 0, 1), (0, 3, 2)]:
        got = {
            (r["a"], r["b"], r["c"])
            for r in tuples_df.filter(
                keyset_predicate(["a", "b", "c"], list(cursor))
            ).collect()
        }
        expected = {t for t in all_rows if t > cursor}
        assert got == expected, cursor


# ---------------------------------------------------------------------------
# HHMM: minutes and display agree; corrected delay is inverse-consistent
# ---------------------------------------------------------------------------
def test_hhmm_minutes_display_consistency(spark):
    from airline_data_pipeline_spark.functions.timefmt import (
        hhmm_delay_minutes,
        hhmm_to_display,
        hhmm_to_minutes,
    )

    rows = [(float(h * 100 + m),) for h in range(0, 24, 3) for m in range(0, 60, 7)]
    df = spark.createDataFrame(rows, "t double")
    out = df.select(
        "t",
        hhmm_to_display(F.col("t")).alias("disp"),
        hhmm_to_minutes(F.col("t")).alias("mins"),
        hhmm_delay_minutes(F.col("t"), F.col("t")).alias("self_delay"),
    ).collect()
    for r in out:
        h, m = divmod(int(r["t"]), 100)
        assert r["disp"] == f"{h:02d}:{m:02d}"
        assert r["mins"] == h * 60 + m
        assert r["self_delay"] == 0


# ---------------------------------------------------------------------------
# int8 quantization: error bound + engine-portability of the integers
# ---------------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=1, max_size=16,
    )
)
def test_quantize_python_model_error_bound_and_duckdb_parity(vec):
    """For any float32 vector: the dequantized values are within half a
    quantization step (scale/254 on |x|<=scale grids → step scale/127,
    half-step scale/254) of the input, |q| <= 127, and DuckDB evaluating
    the same formula on the same bits produces the same integers."""
    scale = max(abs(x) for x in vec)
    if scale == 0:
        return
    q = [math.floor(x * 127 / scale + 0.5) for x in vec]
    assert all(-127 <= v <= 127 for v in q)
    step = scale / 127
    for x, v in zip(vec, q):
        assert abs(x - v * step) <= step / 2 + 1e-12 * scale
    con = duckdb.connect()
    got = con.execute(
        "SELECT list_transform(?::FLOAT[], x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127 / ? + 0.5) AS BIGINT))",
        [vec, scale],
    ).fetchone()[0]
    con.close()
    assert got == q


# ---------------------------------------------------------------------------
# n-gram UDTF law: row count = sum over docs of max(0, n_tokens - n + 1)
# ---------------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet=" abcx\t", min_size=0, max_size=24),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_token_ngrams_count_law(texts, n):
    from airline_data_pipeline_spark.functions.udtfs import TokenNgrams

    # @udtf wraps the handler class; unwrap to drive eval() directly
    cls = TokenNgrams.func if hasattr(TokenNgrams, "func") else TokenNgrams
    total = 0
    for t in texts:
        toks = [w for w in t.split() if w]
        expect = max(0, len(toks) - n + 1)
        rows = list(cls().eval(t, n))
        assert len(rows) == expect
        assert [p for p, _ in rows] == list(range(expect))
        assert all(len(g.split(" ")) == n for _, g in rows)
        total += expect
    assert total >= 0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.sampled_from([f"v{i}" for i in range(12)]),
        min_size=20,
        max_size=400,
    ),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=9),
)
def test_heavy_hitters_equals_exact_group_by(draws, k, parts):
    """Property (Misra-Gries two-pass contract): for ANY value
    distribution, threshold k, and partitioning, heavy_hitters output
    equals the exact {v: count(v)·k > n} set with exact counts."""
    from collections import Counter

    from airline_data_pipeline_spark.operators.sketches import heavy_hitters
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)  # getOrCreate — reuses the active session
    df = spark.createDataFrame([(v,) for v in draws], "v string").repartition(parts)
    got = {(r["value"], r["cnt"]) for r in heavy_hitters(df, "v", k=k).collect()}
    n = len(draws)
    want = {(v, c) for v, c in Counter(draws).items() if c * k > n}
    assert got == want, (k, parts, got, want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(["web", "code", "books", "wiki"]),
        min_size=10,
        max_size=300,
    ),
    st.sampled_from([0.0, 0.3, 0.5, 0.7, 1.0]),
    st.integers(min_value=1, max_value=8),
)
def test_temperature_sample_matches_closed_form(sources, alpha, parts):
    """Property (temperature_sample contract): for ANY source
    distribution, alpha, and partitioning, the kept set equals a pure-
    Python recomputation of the closed-form rate filter — rate_s =
    min(1, budget·n_s^α/Σn_t^α / n_s), keep iff md5-60bit(key||salt)
    mod 1e6 < floor(rate·1e6). Pins both the rate math and the draw,
    independent of Spark AND DuckDB."""
    import hashlib

    from airline_data_pipeline_spark.operators.corpus import temperature_sample
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = [(i, s) for i, s in enumerate(sources)]
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(parts)
    got = {
        r["doc_id"]
        for r in temperature_sample(
            df, source_col="source", key_col="doc_id",
            alpha=alpha, budget_frac=0.5,
        ).collect()
    }

    from collections import Counter

    n_by = Counter(sources)
    sw = sum(n ** alpha for n in n_by.values())
    total = len(sources)
    rate = {
        s: min(1.0, (n ** alpha / sw) * (0.5 * total) / n)
        for s, n in n_by.items()
    }

    def h60(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)

    want = {
        i
        for i, s in rows
        if h60(f"{i}:tsample") % 1_000_000 < int(rate[s] * 1_000_000)
    }
    assert got == want, (alpha, parts, got ^ want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abcdefg hij",  # includes space -> multi-token docs
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_score_hashed_linear_matches_closed_form(texts, parts):
    """Property (score_hashed_linear contract, default pseudo-model):
    for ANY document set and partitioning, per-doc logit_milli equals
    the pure-Python recomputation of bucket -> weight -> sum, n_tokens
    is the true whitespace token count, and token-less docs emit no
    row. Pins the md5 bucket/weight derivation independent of Spark
    AND DuckDB."""
    import hashlib

    from airline_data_pipeline_spark.operators.corpus import score_hashed_linear
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)
    got = {
        r["doc_id"]: (r["logit_milli"], r["n_tokens"])
        for r in score_hashed_linear(df).collect()
    }

    def h60(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)

    want = {}
    for i, t in rows:
        toks = [w for w in t.lower().strip().split() if w]
        if not toks:
            continue
        lm = 0
        for w in toks:
            bucket = h60(f"{w}:qbucket") % (1 << 16)
            lm += h60(f"{bucket}:qmodel") % 2001 - 1000
        want[i] = (lm, len(toks))
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# duplicate_spans == brute-force ExactSubstr model for any corpus
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=1, max_value=5),
)
def test_duplicate_spans_equals_bruteforce_model(doc_toks, w, parts):
    """For ANY corpus, window width, and partitioning, duplicate_spans
    equals the brute-force ExactSubstr model: every w-token window
    occurring more than once is duplicated at every occurrence except
    the global (doc_id, pos) minimum; per-doc duplicated windows merge
    into maximal overlapping/adjacent intervals. A tiny 4-token vocab
    forces dense collisions so the dedup/merge paths are actually
    exercised, and the repartition ensures the result is
    partitioning-independent (the canonical choice is a global min,
    not a partition-local one)."""
    from airline_data_pipeline_spark.operators.dedup import duplicate_spans
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(doc_toks)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(parts)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, span_tokens=w).collect()
    }

    occ: dict = {}
    for did, toks in enumerate(doc_toks):
        if len(toks) < w:
            continue
        for pos in range(len(toks) - w + 1):
            occ.setdefault(" ".join(toks[pos : pos + w]), []).append(
                (did, pos)
            )
    per_doc: dict = {}
    for lst in occ.values():
        for did, pos in lst[1:]:
            per_doc.setdefault(did, []).append((pos, pos + w))
    want = set()
    for did, ivals in per_doc.items():
        merged: list = []
        for s, e in sorted(ivals):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        for s, e in merged:
            want.add((did, s, e))
    assert got == want, (got, want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                # mixed case on purpose: the detector hashes windows of
                # LOWERCASED tokens while the reconstruction rebuilds
                # the lowercased stream — a desync between the two
                # position spaces would drop the wrong tokens
                st.sampled_from(["a", "b", "c", "A", "B"]),
                min_size=0,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=1, max_value=4),
)
def test_remove_duplicate_spans_equals_bruteforce_model(doc_toks, w, parts):
    """remove_duplicate_spans reconstructs exactly 'the lowercased
    token stream minus the model's merged duplicated intervals' for
    ANY corpus, width, and partitioning — including fully-duplicated
    docs (empty clean_text, never dropped), sub-width docs (pass
    through), mixed-case inputs (normalized), and NULL-text docs
    (dropped per the documented contract)."""
    from airline_data_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = [
        (i, None if toks is None else " ".join(toks))
        for i, toks in enumerate(doc_toks)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(parts)
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_tokens_before"],
            r["n_tokens_after"],
        )
        for r in remove_duplicate_spans(df, span_tokens=w).collect()
    }

    norm = {
        i: [t.lower() for t in toks]
        for i, toks in enumerate(doc_toks)
        if toks is not None
    }
    occ: dict = {}
    for did in sorted(norm):
        toks = norm[did]
        if len(toks) < w:
            continue
        for pos in range(len(toks) - w + 1):
            occ.setdefault(" ".join(toks[pos : pos + w]), []).append(
                (did, pos)
            )
    drop: dict = {i: set() for i in norm}
    for lst in occ.values():
        for did, pos in lst[1:]:
            drop[did].update(range(pos, pos + w))
    want = {}
    for did, toks in norm.items():
        kept = [t for p, t in enumerate(toks) if p not in drop[did]]
        want[did] = (" ".join(kept), len(toks), len(kept))
    assert got == want, (got, want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=1, max_value=4),
)
def test_shard_corpus_matches_md5_model_and_is_layout_invariant(ids, n_shards, parts):
    """shard_corpus's key and shard equal the md5 closed form for ANY
    id set, shard count, and partitioning — the layout-invariance that
    makes the training order resumable (rand()/monotonic ids fail it)."""
    import hashlib

    from airline_data_pipeline_spark.operators.corpus import shard_corpus
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    df = spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).repartition(parts)
    got = {
        r["doc_id"]: (r["__shuffle_key"], r["shard"])
        for r in shard_corpus(df, n_shards=n_shards, salt="42").collect()
    }
    want = {}
    for i in ids:
        key = int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:15], 16)
        want[i] = (key, key % n_shards)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_score_bigram_lm_equals_closed_form(doc_toks, parts):
    """score_bigram_lm equals the brute-force bigram LM for ANY corpus
    and partitioning: cb = corpus count of the bigram, cu = corpus
    count of its history, per-doc score = sum of (1000*cb) // cu over
    the doc's bigrams (duplicates counted per occurrence)."""
    from airline_data_pipeline_spark.operators.corpus import score_bigram_lm
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(doc_toks)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(parts)
    got = {
        r["doc_id"]: (r["lm_milli_sum"], r["n_bigrams"])
        for r in score_bigram_lm(df).collect()
    }
    cb: dict = {}
    cu: dict = {}
    doc_bigrams = {}
    for did, toks in enumerate(doc_toks):
        bgs = [
            (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
        ]
        doc_bigrams[did] = bgs
        for b in bgs:
            cb[b] = cb.get(b, 0) + 1
            cu[b[0]] = cu.get(b[0], 0) + 1
    want = {}
    for did, bgs in doc_bigrams.items():
        if not bgs:
            continue
        want[did] = (
            sum((1000 * cb[b]) // cu[b[0]] for b in bgs),
            len(bgs),
        )
    assert got == want, (got, want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "e"]), min_size=0, max_size=8),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_dsir_importance_equals_closed_form(raw_toks, target_toks, parts):
    """dsir_importance equals the brute-force hashed-bigram importance
    model for ANY pair of corpora and partitioning: bucket = md5-60 of
    'bg:dsir' mod B, w[b] = (scale·(p[b]+1)·(q_tot+B)) // ((q[b]+1)·
    (p_tot+B)) with exact big-int arithmetic (the DECIMAL(38,0) twin),
    per-doc score = sum of w over bigram OCCURRENCES. B=16 forces
    bucket collisions so the hash-aggregation path is exercised."""
    import hashlib

    from airline_data_pipeline_spark.operators.corpus import dsir_importance
    from airline_data_pipeline_spark.session import get_spark

    B, SCALE = 16, 1_000_000
    spark = get_spark("props", cpus=8)
    raw = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(raw_toks)],
        "doc_id long, text string",
    ).repartition(parts)
    target = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(target_toks)],
        "doc_id long, text string",
    ).repartition(parts)
    got = {
        r["doc_id"]: (r["dsir_milli_sum"], r["n_bigrams"], r["selected"])
        for r in dsir_importance(raw, target, n_buckets=B).collect()
    }

    def bucket(bg: str) -> int:
        h = hashlib.md5((bg + ":dsir").encode()).hexdigest()[:15]
        return int(h, 16) % B

    def bucket_counts(corpus):
        cnt: dict[int, int] = {}
        per_doc = {}
        for did, toks in enumerate(corpus):
            if len(toks) < 2:
                continue
            bs = [bucket(f"{toks[i]} {toks[i+1]}") for i in range(len(toks) - 1)]
            per_doc[did] = bs
            for b in bs:
                cnt[b] = cnt.get(b, 0) + 1
        return cnt, per_doc

    p, _ = bucket_counts(target_toks)
    q, raw_docs = bucket_counts(raw_toks)
    p_tot, q_tot = sum(p.values()), sum(q.values())
    # numerator clamped at den*cap before the floor division — the
    # overflow-safe min(ratio, cap) form both engines compute
    CAP = SCALE * 1_000_000
    w = {}
    for b in range(B):
        num = SCALE * (p.get(b, 0) + 1) * (q_tot + B)
        den = (q.get(b, 0) + 1) * (p_tot + B)
        w[b] = min(num, den * CAP) // den
    want = {
        did: (
            sum(w[b] for b in bs),
            len(bs),
            sum(w[b] for b in bs) > SCALE * len(bs),
        )
        for did, bs in raw_docs.items()
    }
    assert got == want, (got, want)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=120),
    st.sampled_from([64, 100, 256, 2048]),
    st.integers(min_value=1, max_value=8),
)
def test_pack_greedy_matches_exclusive_prefix_model(toks, budget, parts):
    """Property (pack_greedy contract): for ANY token sizes, budget,
    and input partitioning, bin assignment equals the pure-Python
    exclusive prefix sum — bin_id = floor((cumsum - tok)/budget) in
    doc_id order per (split-like) partition key — so a straddling doc
    starts the next bin's fill, an oversized doc gets its own bin, and
    the layout of the input never moves a document."""
    from airline_data_pipeline_spark.operators.corpus import pack_greedy
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = [(i, i % 3, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(
        rows, "doc_id long, grp long, toks long"
    ).repartition(parts)
    got = {
        r["doc_id"]: r["bin_id"]
        for r in pack_greedy(
            df, F.col("toks"), budget=budget,
            order_by=["doc_id"], partition_by=["grp"],
        ).collect()
    }
    want = {}
    for g in {r[1] for r in rows}:
        run = 0
        for i, grp, t in rows:
            if grp != g:
                continue
            want[i] = run // budget
            run += t
    assert got == want, (budget, parts, got, want)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),   # unique-ified below
            st.sampled_from(["a", "b", "c", "d"]),      # key
            st.sampled_from(["x", "y", "z"]),           # payload
        ),
        min_size=1,
        max_size=150,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_dedup_exact_equals_min_id_model(rows, parts):
    """Property (dedup_exact min_by contract, rewritten round 8): for
    ANY duplicate distribution and input partitioning, the survivor set
    equals the pure-Python {key: full row of min id} model — the whole
    row comes from ONE input row, never a column mix across
    duplicates."""
    from airline_data_pipeline_spark.operators.dedup import dedup_exact
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    uniq = [(i, k, p) for i, (_, k, p) in enumerate(rows)]
    df = spark.createDataFrame(
        uniq, "doc_id long, key string, payload string"
    ).repartition(parts)
    got = {tuple(r) for r in dedup_exact(df, ["key"], "doc_id").collect()}
    want = {}
    for i, k, p in uniq:
        if k not in want or i < want[k][0]:
            want[k] = (i, k, p)
    assert got == set(want.values()), (parts, got, want)


@settings(max_examples=20, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=4),
    alpha=st.sampled_from([0.0, 0.5, 1.0]),
    budget=st.sampled_from([0.5, 1.0, 2.0, 3.5]),
    max_epochs=st.sampled_from([2, 4]),
)
def test_epoch_replication_matches_python_model(sizes, alpha, budget, max_epochs):
    """Property (epoch plan contract): for ANY source-size distribution,
    temperature, budget multiplier, and epoch cap, the full (doc, epoch)
    replica set equals the pure-Python recomputation of
    rate -> 9-decimal snap -> floor/frac split -> md5 partial-epoch
    draw. Pins: replicas per doc = floor(rate) or floor(rate)+1, never
    above max_epochs, and a doc's partial-epoch draw is a pure function
    of its key (adding sources never resamples old docs)."""
    import hashlib
    import math as m

    from airline_data_pipeline_spark.operators.corpus import (
        epoch_replication_plan,
    )
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("props", cpus=8)
    rows = []
    i = 0
    for s_idx, n in enumerate(sizes):
        for _ in range(n):
            rows.append((i, f"s{s_idx}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(3)
    got = {
        (r["doc_id"], r["epoch"])
        for r in epoch_replication_plan(
            df, alpha=alpha, budget_mult=budget, max_epochs=max_epochs
        ).collect()
    }
    sw = sum(n**alpha for n in sizes)
    total = sum(sizes)
    want = set()
    for s_idx, n in enumerate(sizes):
        rate = min(float(max_epochs), (n**alpha / sw) * (budget * total) / n)
        rate = m.floor(rate * 1e9 + 0.5) / 1e9
        full = int(m.floor(rate))
        thr = m.floor((rate - m.floor(rate)) * 1_000_000)
        for doc, src in rows:
            if src != f"s{s_idx}":
                continue
            h = int(
                hashlib.md5(f"{doc}:epoch".encode()).hexdigest()[:15], 16
            ) % 1_000_000
            reps = full + (1 if h < thr else 0)
            for e in range(1, reps + 1):
                want.add((doc, e))
    assert got == want
    assert all(e <= max_epochs for _, e in got)
