"""Corpus-preparation operators for training-data pipelines
(SURVEY.md §2.10 extensions).

Two steps every LLM data pipeline runs after dedup/filtering:

- `assign_split`   — deterministic train/val/test assignment by key
  hash. A pure function of the key (md5-portable, see
  `functions/text.portable_hash60`): invariant under repartitioning,
  reproducible by any engine, and stable when the corpus grows — a doc
  never migrates between splits because other docs were added (the
  property rng-based splitting lacks).
- `pack_greedy`    — sequential greedy packing of documents into
  fixed-token-budget bins (the sequence-packing step before training):
  bin id = floor(exclusive-running-token-sum / budget) over a defined
  total order. One window pass, no shuffle beyond the ordering; at
  cluster scale the order key is typically (shard, doc_id) so the
  cumsum window partitions by shard and runs embarrassingly parallel.

Both are single-pass JVM expressions — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from airline_data_pipeline_spark.functions.numeric import round_half_up
from airline_data_pipeline_spark.functions.text import (
    portable_hash60,
    shingles,
    tokens,
)


def _salted_key(key_col: str, salt: str) -> Column:
    """md5-60-bit hash of "<key>:<salt>" — the module's ONE salted-key
    expression. `F.concat` (not concat_ws) on purpose: a NULL key must
    propagate to a NULL hash, matching the SQL twin's
    ``key || ':salt'`` (NULL → NULL) instead of silently hashing the
    bare salt string."""
    return portable_hash60(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )


def _hash_bucket(key_col: str, salt: str, denom: int) -> Column:
    """The module's ONE deterministic draw: md5-60-bit hash of
    "<key>:<salt>" mod ``denom``. Every sampler/splitter here shares
    this expression because its exact shape IS the cross-engine
    contract — each SQL oracle twin recomputes
    ``('0x' || substr(md5(key || ':salt'),1,15))::BIGINT % denom``
    verbatim, so a tweak applied to one operator's copy but not the
    others would silently break oracle parity for the rest."""
    return F.pmod(_salted_key(key_col, salt), F.lit(denom))


def assign_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column ('train' | 'val' | 'test') keyed on a
    deterministic hash of ``key_col`` — val gets [0, val_pct) of the
    hash-mod-100 space, test the next ``test_pct``, train the rest."""
    bucket = _hash_bucket(key_col, salt, 100)
    return df.withColumn(
        "split",
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def pack_greedy(
    df: DataFrame,
    token_col,
    budget: int,
    order_by: list[str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Assign each row a `bin_id`: sequential greedy packing under the
    given total order — a row starts in the bin where the running token
    total before it landed. Documents larger than the budget get their
    own bin (standard practice: they are truncated downstream).

    bin_id = floor((cumsum(tokens) − tokens) / budget) — the EXCLUSIVE
    prefix sum, so a doc that would straddle a boundary begins the next
    bin's fill rather than splitting. ``partition_by`` (e.g. a shard
    column) keeps the window parallel at corpus scale; ordering is the
    only shuffle.
    """
    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    running = F.sum(token_col).over(w) - token_col
    return df.withColumn("bin_id", F.floor(running / F.lit(budget)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "strata",
    denom: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key's
    hash-mod-``denom`` bucket falls below fraction*denom for its
    stratum (`sampleBy` semantics, but reproducible across runs,
    engines, and partitionings — the Bernoulli draw is a pure function
    of the key, so growing the corpus never resamples old rows).

    No shuffle at all: the filter is a row-local expression, pushable
    to the scan. Fractions are quantized to 1/denom.
    """
    bucket = _hash_bucket(key_col, salt, denom)
    threshold = F.lit(int(default_fraction * denom))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(frac * denom))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def filter_by_source_quality(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Source-level quality gate (the "drop low-quality domains" pass a
    web-scale corpus runs before doc-level filtering).

    Two passes: per-source MEAN quality score (one aggregate whose
    result is dimension-sized — #sources rows, thousands at web scale),
    then a broadcast left-semi join keeps documents of passing sources.
    The corpus never shuffles: scoring is row-local JVM expressions
    (`functions/text.py::quality_score`), the gate table broadcasts.
    """
    from airline_data_pipeline_spark.functions.text import quality_score

    scores = df.select(
        F.col(source_col), quality_score(F.col(text_col)).alias("__q")
    )
    good = (
        scores.groupBy(source_col)
        .agg(F.avg("__q").alias("__mq"))
        .filter(F.col("__mq") >= threshold)
        .select(source_col)
    )
    return df.join(F.broadcast(good), source_col, "left_semi")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    salt: str = "wsample",
    denom: int = 10_000,
) -> DataFrame:
    """Deterministic Bernoulli sampling with a PER-ROW keep probability
    (quality/length-weighted corpus downsampling): keep a row iff its
    key's hash-mod-``denom`` bucket falls below ``weight``·``denom``.

    ``weight`` is any row-local Column in [0, 1] — a quality score, a
    token-count ramp, a source prior. Like `stratified_sample`, the
    draw is a pure function of the key: reproducible across runs,
    engines, and partitionings, and growing the corpus never resamples
    old rows. No shuffle — the filter is row-local and pushable.
    Probabilities are quantized to 1/denom.
    """
    bucket = _hash_bucket(key_col, salt, denom)
    return df.filter(bucket < F.floor(weight * denom))


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    salt: str = "tsample",
    denom: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source rebalancing — the multi-source MIXING
    stage of LLM training pipelines (Gopher/MassiveText, multilingual
    LLaMA-style sampling): draw from source s with probability
    ∝ n_s^alpha, flattening the natural source distribution. alpha=1
    keeps natural proportions, alpha=0 is uniform over sources, and
    the usual 0.2-0.7 range up-weights small high-quality sources
    without letting a giant crawl dominate.

    Under a total budget of ``budget_frac``·N docs, source s gets
    target_s = budget·n_s^alpha / Σ_t n_t^alpha, i.e. per-row keep rate
    min(1, target_s / n_s). The plan scales: one source-count aggregate
    (output rows = number of sources — tiny), the per-source rates
    broadcast-joined back, then the same deterministic hash-Bernoulli
    row filter as `weighted_sample` — no data-sized shuffle anywhere,
    and the draw is a pure function of the key, so it is reproducible
    across runs/engines/partitionings and adding documents never
    resamples old ones (rates shift, but each row's bucket is fixed).
    Rates are quantized to 1/denom (default 1e-6), with the raw
    pow()/window-sum double rounded HALF-UP to 9 decimals FIRST — the
    keep threshold is floor(rate·denom), and without the fixed-decimal
    snap a rate sitting exactly on an integer boundary of denom could
    flip on libm last-bit or summation-order drift between engines (or
    across partitionings), silently moving a whole source's bucket
    cutoff. 9 decimals is 1000× finer than the 1e-6 quantization, so
    the snap never changes an intended rate, only kills the ulp noise
    (the round-before-rank discipline of the kNN family).
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    # Global totals via an unbounded window over the COUNTS frame (rows
    # = number of sources, so the single-partition window is trivial) —
    # avoids a self-referential counts⋈agg(counts) join entirely
    w = Window.partitionBy(F.lit(1))
    rates = counts.select(
        source_col,
        F.least(
            F.lit(1.0),
            (F.pow(F.col("__n"), F.lit(alpha))
             / F.sum(F.pow(F.col("__n"), F.lit(alpha))).over(w))
            * (F.lit(budget_frac) * F.sum("__n").over(w))
            / F.col("__n"),
        ).alias("__rate"),
    )
    bucket = _hash_bucket(key_col, salt, denom)
    # Null-safe join: a NULL source is a legitimate group — groupBy
    # already counted it into the normalizer and total, so a plain
    # equi-join (NULL never equals NULL) would silently DROP those rows
    # while still deflating every real source's rate below the
    # requested budget. eqNullSafe keeps NULL-source rows sampled at
    # their own group's rate.
    r = rates.withColumnRenamed(source_col, "__rate_src")
    return (
        df.join(
            F.broadcast(r),
            F.col(source_col).eqNullSafe(F.col("__rate_src")),
        )
        .filter(bucket < F.floor(round_half_up(F.col("__rate"), 9) * denom))
        .drop("__rate", "__rate_src")
    )


def epoch_replication_plan(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    budget_mult: float = 2.0,
    alpha: float = 0.5,
    max_epochs: int = 4,
    salt: str = "epoch",
    denom: int = 1_000_000,
) -> DataFrame:
    """Data-constrained scaling: a per-document EPOCH REPLICATION plan
    (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    Models": repeating data up to ~4 epochs is nearly as good as fresh
    data; beyond that returns collapse — hence ``max_epochs=4``).

    Generalizes `temperature_sample` from keep-rates ≤ 1 to rates > 1:
    a token budget of ``budget_mult``·N docs is allocated across
    sources by the same n^alpha temperature weights, and source s's
    rate target_s/n_s now REPLICATES docs instead of only thinning —
    each doc appears floor(rate) times, plus once more with
    probability frac(rate) drawn by the module's deterministic
    hash-Bernoulli (rates snapped to 9 decimals before the
    floor(frac·denom) threshold, the same boundary-ulp discipline as
    `temperature_sample`). Small high-quality sources epoch up to
    ``max_epochs``; a giant crawl stays ≤ 1 epoch. The draw is a pure
    function of the key, so re-planning with more data never reshuffles
    which docs carry the partial epoch.

    Returns one row per (doc replica): all input columns plus
    ``epoch`` (1-based). Plan shape at 100 TB: one tiny source-count
    aggregate, rates broadcast back, then a row-local
    explode(sequence(1, k)) — no data-sized shuffle anywhere; the
    output feeds the shard-manifest/packing stages directly.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(F.lit(1))
    rate = F.least(
        F.lit(float(max_epochs)),
        (F.pow(F.col("__n"), F.lit(alpha))
         / F.sum(F.pow(F.col("__n"), F.lit(alpha))).over(w))
        * (F.lit(budget_mult) * F.sum("__n").over(w))
        / F.col("__n"),
    )
    rate = round_half_up(rate, 9)
    rates = counts.select(
        F.col(source_col).alias("__rate_src"),
        F.floor(rate).cast("int").alias("__full"),
        F.floor((rate - F.floor(rate)) * denom).cast("long").alias("__frac_thr"),
    )
    bucket = _hash_bucket(key_col, salt, denom)
    n_rep = (
        F.col("__full")
        + F.when(bucket < F.col("__frac_thr"), F.lit(1)).otherwise(F.lit(0))
    )
    # sequence(1, 0) yields a DESCENDING [1, 0] in Spark — a zero-
    # replica doc must produce an empty array, not two phantom epochs
    epochs = F.when(
        n_rep >= 1, F.sequence(F.lit(1), n_rep)
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__rate_src")),
        )
        .select(*df.columns, F.explode(epochs).alias("epoch"))
    )


def score_hashed_linear(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
    n_buckets: int = 1 << 16,
    model: DataFrame | None = None,
    salt_bucket: str = "qbucket",
    salt_model: str = "qmodel",
) -> DataFrame:
    """Apply a hashing-trick LINEAR text classifier (the fastText/CCNet
    quality-filter shape) with zero Python in the path: tokens hash to
    ``n_buckets`` feature buckets, the per-bucket weight table joins in
    as a BROADCAST model, and the per-doc logit is one map-side-combined
    aggregate. This is the engine's model-apply pattern: a learned
    linear scorer is just (explode → broadcast weight join → sum), so
    scoring 100 TB is one scan with a dimension-sized join — no UDF, no
    per-row model invocation.

    ``model`` is any (bucket: long, w_milli: long) DataFrame — weights
    in integer milli-units so the per-doc logit sum is EXACT int64
    (order-independent, oracle-checkable). A SPARSE model is fine: the
    weight join is a LEFT join with missing buckets coalesced to
    weight 0 (the linear-model convention for unseen features), so
    out-of-vocabulary tokens still count toward ``n_tokens`` and a doc
    whose tokens all miss the model scores logit 0 rather than
    silently vanishing. When omitted, a deterministic pseudo-model is
    derived from the md5-portable hash of the bucket id (range
    [-1000, 1000] milli), so tests and oracles can recompute it from
    first principles — swap in trained weights for production use.

    Returns one row per doc with ≥1 token: (id, carry..., logit_milli,
    n_tokens, logit = logit_milli / (1000·n_tokens)). Thresholding at
    logit ≥ 0 is equivalent to sigmoid(logit) ≥ 0.5 — the sigmoid is
    monotone, so classification never needs the exp() (whose last-bit
    libm differences would cost cross-engine reproducibility).
    """
    from airline_data_pipeline_spark.functions.text import portable_hash60, tokens

    if model is None:
        model = df.sparkSession.range(n_buckets).select(
            F.col("id").alias("bucket"),
            (
                F.pmod(
                    portable_hash60(
                        F.concat(F.col("id").cast("string"), F.lit(":" + salt_model))
                    ),
                    F.lit(2001),
                )
                - F.lit(1000)
            ).alias("w_milli"),
        )
    carry = [F.col(c) for c in carry_cols or []]
    toks = df.select(
        F.col(id_col),
        *carry,
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__tk"),
    )
    bucketed = toks.withColumn(
        "bucket",
        F.pmod(
            portable_hash60(F.concat(F.col("__tk"), F.lit(":" + salt_bucket))),
            F.lit(n_buckets),
        ),
    )
    return (
        bucketed.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col, *[c for c in (carry_cols or [])])
        .agg(
            F.sum(F.coalesce(F.col("w_milli"), F.lit(0))).alias("logit_milli"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .withColumn(
            "logit", F.col("logit_milli") / (F.lit(1000.0) * F.col("n_tokens"))
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding-window document chunking (the RAG/pre-training splitter):
    one output row per (doc, window) with the window's text and token
    count.

    Contract: windows of ``chunk_tokens`` whitespace tokens start at
    positions 1, 1+stride, … while a FULL window still fits
    (start ≤ n − chunk_tokens + 1); a doc shorter than one window
    yields a single whole-doc chunk. Tail tokens past the last full
    window appear only through the final window's overlap — the
    fixed-length drop-tail convention of training pipelines (set
    stride = chunk_tokens for disjoint packing, smaller for overlap).

    Entirely JVM expressions: token split once, start positions via
    `sequence`, window text via `slice` + `array_join`, fan-out via
    `posexplode` — row-local (no shuffle), linear in text size, and
    the chunk explosion happens AFTER any pushed-down doc filters.
    """
    from airline_data_pipeline_spark.functions.text import tokens

    # Coalesce NULL text to an empty token array: otherwise size(null)
    # is null, greatest/least skip nulls, and a null doc emits a
    # phantom full-size chunk (chunk_tokens = the literal, null text)
    # that inflates token totals. With the coalesce a null/blank doc
    # yields one 0-token whole-doc chunk with empty text.
    toks = F.coalesce(
        tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    n = F.size(toks)
    last_start = F.greatest(n - F.lit(chunk_tokens - 1), F.lit(1))
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    carry = [F.col(c) for c in carry_cols or []]
    return (
        df.select(
            F.col(id_col),
            *carry,
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            F.col(id_col),
            *carry,
            F.col("chunk_id"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start"), F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size("__toks") - F.col("__start") + 1
            ).cast("long").alias("chunk_tokens"),
        )
    )


def shard_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "42",
) -> DataFrame:
    """df + (__shuffle_key, shard) — the deterministic global shuffle
    every training run needs: a reproducible pseudo-random corpus
    order plus a balanced shard assignment, both pure functions of
    (id, salt).

    Training-data order must be (a) decorrelated from ingest order —
    adjacent source docs are correlated, and a model fed a sorted
    corpus sees non-stationary batches — and (b) EXACTLY reproducible
    across reruns, engines, and cluster sizes, or a resumed/re-sharded
    run silently trains on a different stream. `ORDER BY rand()` fails
    (b); `monotonically_increasing_id` fails both (partition-layout
    dependent). The md5-portable 60-bit hash of `id:salt` gives a
    uniform, engine-reproducible key: global order = (key, id) —
    the id tiebreak covers hash collisions — and shard =
    key mod n_shards, so each shard is itself an unbiased sample
    (changing the salt reshuffles everything). At cluster scale the
    writer does `repartition(n_shards, shard)` +
    `sortWithinPartitions(key, id)` — one shuffle, no global sort:
    within-shard order is the contract consumers read one shard at a
    time with.
    """
    key = _salted_key(id_col, salt)
    return df.withColumn("__shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("__shuffle_key"), F.lit(n_shards))
    )


def score_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc bigram language-model fluency — the KenLM-filter shape
    (CCNet/Gopher-style "does this read like the corpus" gate)
    self-trained on the corpus in the SAME job, zero Python:

    1. train: one groupBy over all bigrams → count(w1 w2); the history
       mass count(w1 ·) is a window sum over the (small) bigram
       vocabulary, not a second corpus scan.
    2. score: each doc's bigrams join the vocabulary (hash equi-join
       on the bigram string) and score floor(1000·cb/cu) — the exact
       integer milli-probability of P(w2|w1), engine-exact by integer
       division (no float log-prob: libm last-bit differences would
       cost cross-engine reproducibility; the mean milli-prob is a
       monotone fluency proxy, which is all a filter thresholds).

    Returns one row per doc with ≥1 bigram: (id, carry...,
    lm_milli_sum, n_bigrams, fluency = lm_milli_sum/(1000·n_bigrams)).
    Production swaps step 1's counts for a pre-trained table through
    the identical scoring plan. At 100 TB the bigram vocabulary is
    the only intermediate bigger than the corpus scan — it shuffles
    once as (bigram, count) pairs, and the scoring join is the same
    postings-shape equi-join as the dedup family.
    """
    carry = carry_cols or []
    eligible = df.filter(F.size(tokens(F.col(text_col))) >= 2)
    big = eligible.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(shingles(F.col(text_col), 2)).alias("__bg"),
    )
    vocab = big.groupBy("__bg").agg(F.count(F.lit(1)).alias("__cb"))
    hist = Window.partitionBy(F.substring_index(F.col("__bg"), " ", 1))
    vocab = vocab.withColumn("__cu", F.sum("__cb").over(hist))
    scored = big.join(vocab, "__bg").withColumn(
        "__milli", F.expr("(1000 * __cb) div __cu")
    )
    return (
        scored.groupBy(id_col, *carry)
        .agg(
            F.sum("__milli").alias("lm_milli_sum"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .withColumn(
            "fluency",
            F.col("lm_milli_sum") / (F.lit(1000.0) * F.col("n_bigrams")),
        )
    )


def dsir_importance(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
    n_buckets: int = 4096,
    scale: int = 1_000_000,
    salt: str = "dsir",
    select_milli: int | None = None,
) -> DataFrame:
    """DSIR-shape importance scoring (Data Selection via Importance
    Resampling, Xie et al. 2023): score every ``raw_df`` doc by how
    much more likely its hashed-bigram features are under the TARGET
    corpus distribution than under the raw corpus distribution —
    the "select web data that looks like my curated set" primitive.

    Integer-exact variant of the paper's log-ratio score, in the
    engine's house style (cf. `score_bigram_lm`): each feature bucket
    gets the add-1-smoothed RATIO, scaled and floored to an integer,

        w[b] = floor(scale · (p_cnt[b]+1)·(q_tot+B)
                           / ((q_cnt[b]+1)·(p_tot+B)))

    (p = target counts, q = raw counts, B = n_buckets), and a doc's
    score is the SUM of its bigram-occurrence weights — a monotone
    mean-importance proxy that needs no transcendental log (libm
    last-bit drift would cost cross-engine reproducibility; selection
    only thresholds the mean, so the monotone surrogate is enough).
    The products run in DECIMAL(38,0) with the per-bucket ratio
    clamped at 1e6 (numerator clamped at den·cap before the exact
    `div`, the overflow-safe form of min(ratio, cap)) — exact to
    ~1e14 total bigrams (several hundred TB of text) on both engines.

    Plan shape at 100 TB: two bigram count aggregates (map-side
    combined), a B-row weight table (MODEL-sized, broadcast), and one
    explode → broadcast-join → per-doc sum over the raw side — the
    same scan-plus-dimension-join shape as `score_hashed_linear`.
    Returns one row per raw doc with ≥1 bigram: (id, carry...,
    dsir_milli_sum, n_bigrams, importance = milli_sum/(scale·n),
    selected = milli_sum > select_milli·n). ``select_milli`` defaults
    to ``scale`` (mean ratio > 1, "more target-like than the raw
    average") — but when raw is much larger than target the smoothed
    ratios sit well below 1 corpus-wide, so callers selecting a fixed
    FRACTION should pass a measured quantile of the mean-milli
    distribution instead (cf. the LM gate's 33-milli choice).
    """
    spark = raw_df.sparkSession
    carry = carry_cols or []
    if select_milli is None:
        select_milli = scale

    def bigram_buckets(df: DataFrame, cols: list[str]) -> DataFrame:
        eligible = df.filter(F.size(tokens(F.col(text_col))) >= 2)
        return eligible.select(
            *[F.col(c) for c in cols],
            F.explode(shingles(F.col(text_col), 2)).alias("__bg"),
        ).select(
            *[F.col(c) for c in cols],
            F.pmod(
                portable_hash60(F.concat(F.col("__bg"), F.lit(":" + salt))),
                F.lit(n_buckets),
            ).alias("bucket"),
        )

    p = bigram_buckets(target_df, []).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("p_cnt")
    )
    # raw_b feeds BOTH the q-count aggregate and the scoring join, but
    # persist() is a measured NO-OP here (cache-cleared interleaved A/B
    # at sf0.1, 5 reps: persist median 0.958 s vs recompute 0.983 s —
    # inside noise; the md5 bigram pass is not the dominant cost the
    # way the shingle sets are in dedup_minhash), so the simpler
    # recompute form stands.
    raw_b = bigram_buckets(raw_df, [id_col, *carry])
    q = raw_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("q_cnt"))
    totals = (
        p.agg(F.coalesce(F.sum("p_cnt"), F.lit(0)).alias("p_tot"))
        .crossJoin(q.agg(F.coalesce(F.sum("q_cnt"), F.lit(0)).alias("q_tot")))
    )
    weights = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(p, "bucket", "left")
        .join(q, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            # num is clamped at den·cap BEFORE the division (identity:
            # min(num, den·cap) div den = min(num div den, cap)), so the
            # div result always fits BIGINT — without the clamp a bucket
            # holding most target mass over a petabyte-scale raw corpus
            # pushes w past 9.2e18, where Spark's non-ANSI BIGINT cast
            # returns NULL and the per-doc sum silently skips it while
            # the HUGEINT oracle keeps the true value. cap = scale·1e6
            # (ratio 1e6 — beyond that, importance carries no signal).
            F.expr(
                f"CAST(least("
                f"  CAST({scale} AS DECIMAL(38,0))"
                f"    * (coalesce(p_cnt, 0) + 1) * (q_tot + {n_buckets}),"
                f"  (CAST(coalesce(q_cnt, 0) + 1 AS DECIMAL(38,0))"
                f"    * (p_tot + {n_buckets})) * CAST({scale} AS DECIMAL(38,0)) * 1000000"
                f") div (CAST(coalesce(q_cnt, 0) + 1 AS DECIMAL(38,0))"
                f"  * (p_tot + {n_buckets})) AS BIGINT)"
            ).alias("__w"),
        )
    )
    return (
        raw_b.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, *carry)
        .agg(
            F.sum("__w").alias("dsir_milli_sum"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .select(
            id_col,
            *carry,
            "dsir_milli_sum",
            "n_bigrams",
            (
                F.col("dsir_milli_sum")
                / (F.lit(float(scale)) * F.col("n_bigrams"))
            ).alias("importance"),
            (
                F.col("dsir_milli_sum") > F.lit(select_milli) * F.col("n_bigrams")
            ).alias("selected"),
        )
    )
