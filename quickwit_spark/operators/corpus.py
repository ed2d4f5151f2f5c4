"""Corpus-level statistics operators for training-data pipelines: n-gram
language-model scoring (perplexity filtering, CCNet/KenLM tier) and
deterministic temperature-based source mixing (data-mixture planning).

Everything here is two-pass Spark: one corpus aggregation producing a small
model/plan, then one scoring/sampling pass that broadcasts it. Nothing
iterates, nothing collects the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


# --- deterministic engine-portable pseudo-random rank keys -----------------
#
# Two Lehmer (multiplicative-congruential) streams over coprime prime moduli.
# Each stream is a bijection on its residue class, and by CRT the PAIR
# (k1, k2) is injective for ids below M1*M2 ≈ 4.6e18 — i.e. collision-free
# over the practical int64 id space, so rank ties (and the low-id tie bias a
# small-modulus mix would have) cannot occur. k3 re-mixes the pair back into
# one 31-bit key that stays well-spread if EITHER residue varies, which is
# what threshold pre-filters compare against. All intermediates fit in int64
# ((M1-18)*k1 + k2 < 2^63), so DuckDB restates the same arithmetic verbatim
# — unlike xxhash64, which has no DuckDB equivalent.
#
# This replaces the earlier 16-bit LCG ((id*40503+2531011) % 65536), whose
# 65,536 distinct keys biased >65k-row strata toward low ids on rank ties.

_MIX_M1, _MIX_A1 = 2147483647, 48271  # Park–Miller minimal standard (2^31-1)
_MIX_M2, _MIX_A2 = 2147483629, 16807  # second prime-modulus stream


def sample_mix_cols(id_col: str):
    """(k1, k2, k3) deterministic rank-key Columns for ``id_col`` (int64).

    Order by (k3, k1, k2) for a total, collision-free pseudo-random order;
    threshold on k3 (uniform-ish on [0, M1)) for hash-fraction pre-filters.
    """
    c = F.col(id_col)
    k1 = (c % _MIX_M1 + 1) * _MIX_A1 % _MIX_M1
    k2 = (c % _MIX_M2 + 1) * _MIX_A2 % _MIX_M2
    k3 = ((F.lit(_MIX_M1 - 18) * k1 + k2) % _MIX_M1 + 1) * _MIX_A1 % _MIX_M1
    return k1, k2, k3


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    score_df: DataFrame | None = None,
    max_broadcast_bigrams: int = 5_000_000,
) -> DataFrame:
    """Per-doc cross-entropy + perplexity under an add-α-smoothed bigram LM
    trained on the corpus itself — the perplexity-filter quality signal
    (CCNet-style: docs whose perplexity under an in-domain LM is extreme are
    dropped or bucketed). Returns (id, n_bigrams, cross_entropy, perplexity),
    both rounded to 6 dp.

    P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V), V = unigram vocab size.

    ``score_df`` scores a DIFFERENT frame under the LM trained on ``df``
    (the real filtering setup: LM trained in-domain, applied to the crawl);
    its unseen bigrams take the backoff floor log(α/(c1+αV)). Scoring the
    training corpus itself (score_df=None) skips the backoff join — every
    bigram is seen by construction.

    Scale shape: training is two hash aggregations (unigram + bigram counts
    — partial aggregation map-side, one shuffle each); scoring joins each
    doc bigram against the model. The broadcast hint is CONDITIONAL on an
    estimated model size (vocab ≤ ``max_broadcast_bigrams``/20 — natural
    text runs ~10-40 distinct bigrams per vocab word): a small in-domain LM
    broadcasts, a huge one falls back to Spark's own join choice
    (sort-merge keyed by the bigram) instead of force-broadcasting itself
    into a driver OOM. Both shapes stay one shuffle over the exploded
    corpus. No Python in either pass.
    """
    def explode_bigrams(frame):
        toks = frame.select(F.col(id_col), _tokens(F.col(text_col)).alias("t"))
        return toks, toks.select(
            F.col(id_col),
            F.posexplode(
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("t") - 2),
                        lambda i: F.struct(
                            F.element_at("t", i + 1).alias("w1"),
                            F.element_at("t", i + 2).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("pos", "bg"),
        ).select(F.col(id_col), "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    toks, bigrams = explode_bigrams(df)
    # ONE tokenize+explode pass trains BOTH histograms: unigrams ride as
    # (w, NULL) grams next to the bigram structs, one groupBy, and the
    # (vocab + distinct-bigram)-sized count table is localCheckpointed so
    # vocab-count, model build and the scoring join all read the
    # materialized rows instead of each re-running the corpus pass
    # (previously: 3 tokenize scans — uni.count(), the model subtree, and
    # the scoring subtree; now: 1 training + 1 scoring scan).
    grams = toks.select(
        F.explode(
            F.concat(
                F.transform(
                    F.col("t"),
                    lambda w: F.struct(
                        w.alias("w1"), F.lit(None).cast("string").alias("w2")
                    ),
                ),
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("t") - 2),
                        lambda i: F.struct(
                            F.element_at("t", i + 1).alias("w1"),
                            F.element_at("t", i + 2).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
            )
        ).alias("g")
    )
    gram_counts = (
        grams.select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    uni = gram_counts.filter(F.col("w2").isNull()).select(
        "w1", F.col("c").alias("c1")
    )
    vocab = uni.count()
    bi = gram_counts.filter(F.col("w2").isNotNull()).select(
        "w1", "w2", F.col("c").alias("c12")
    )
    # broadcast decision from the vocab count we already have (no extra
    # job): natural-language corpora run ~10-40 distinct bigrams per vocab
    # word, so vocab ≤ max_broadcast_bigrams/20 keeps the estimated model
    # comfortably broadcastable; a huge-vocab corpus falls through to
    # Spark's own join choice instead of a forced broadcast OOM. (A
    # measured bi.count() probe was tried and costs a full extra
    # explode+agg pass — 2× on the bench — for a decision the estimate
    # gets right at both extremes.)
    est_small = vocab <= max(max_broadcast_bigrams // 20, 1)
    maybe_bc = (lambda f: F.broadcast(f)) if est_small else (lambda f: f)
    uni_small = est_small
    logp_expr = F.log(
        (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha * vocab))
    )
    if score_df is None:
        # scoring the training corpus: every bigram is in the model by
        # construction — no backoff join on the hot path. The bigram and
        # unigram tables join the scoring pass DIRECTLY from the
        # checkpoint (logp computed inline — same expression, same
        # result): materializing an intermediate model = bi ⋈ uni first
        # put an extra join job on the critical path before the model
        # broadcast could even start building (guide §2.4).
        scored = (
            bigrams.join(maybe_bc(bi), ["w1", "w2"])
            .join(maybe_bc(uni), "w1")
            .withColumn("logp", logp_expr)
        )
    else:
        model = maybe_bc(
            bi.join(F.broadcast(uni) if uni_small else uni, "w1").select(
                "w1", "w2", logp_expr.alias("logp")
            )
        )
        # external frame: unseen bigrams back off to the floor
        # log(α / (c1 + αV)); c1 = 0 for an unseen history word → log(1/V)
        _, target = explode_bigrams(score_df)
        scored = (
            target.join(F.broadcast(uni) if uni_small else uni, "w1", "left")
            .join(model, ["w1", "w2"], "left")
            .withColumn(
                "logp",
                F.coalesce(
                    F.col("logp"),
                    F.log(
                        F.lit(alpha)
                        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha * vocab))
                    ),
                ),
            )
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.avg("logp")).alias("_h"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            F.round("_h", 6).alias("cross_entropy"),
            F.round(F.exp("_h"), 6).alias("perplexity"),
        )
    )


def mixture_plan(
    df: DataFrame,
    temperature: float = 0.7,
    budget_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source-mixing plan + deterministic realization —
    the data-mixing step of a pretraining pipeline (multinomial sampling
    with exponent τ as in multilingual/LLM corpus weighting): target share
    of source i ∝ (n_i)^τ, re-normalized; the overall budget is
    ``budget_frac`` of the corpus. Returns one row per source:
    (source, n_docs, nat_share, target_share, rate, n_kept).

    Realization is a DETERMINISTIC per-doc keep rule — keep iff
    ``k3(id) < rate * (2^31 - 1)`` with k3 the re-mixed Lehmer-pair key of
    :func:`sample_mix_cols` — reproducible across runs/engines and
    independent of partitioning, with 2^31-1 distinct decision keys (the
    earlier 16-bit LCG quantized rates to 1/65536 and correlated the keep
    set with id low bits; the raw k1 stream is unusable here because it is
    LINEAR without wraparound for ids < M1/A1 ≈ 44k, so a small
    consecutive-id source would keep a contiguous prefix instead of a
    uniform subset — k3's big-stride re-mix equidistributes even tiny id
    blocks). Rates are capped at 1 (a source cannot be
    up-sampled without replication, which is a separate op).

    Scale shape: one groupBy(source) for counts (tiny result), the plan
    computed on that aggregate, then one broadcast-joined filter pass for
    n_kept — metadata-size driver state only.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs")).collect()[0][0] or 0
    plan = counts.select(
        source_col,
        "n_docs",
        (F.col("n_docs") / F.lit(float(total))).alias("nat_share"),
        F.pow(F.col("n_docs").cast("double"), F.lit(temperature)).alias("_w"),
    )
    wsum = plan.agg(F.sum("_w")).collect()[0][0]
    plan = plan.select(
        source_col,
        "n_docs",
        "nat_share",
        (F.col("_w") / F.lit(wsum)).alias("target_share"),
        F.least(
            F.lit(1.0),
            (F.col("_w") / F.lit(wsum)) * F.lit(budget_frac * total) / F.col("n_docs"),
        ).alias("rate"),
    )
    keep = sample_mix_cols(id_col)[2] < (F.col("rate") * _MIX_M1)
    kept = (
        df.select(F.col(id_col), F.col(source_col))
        .join(F.broadcast(plan.select(source_col, "rate")), source_col)
        .filter(keep)
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        plan.join(kept, source_col, "left")
        .select(
            source_col,
            "n_docs",
            F.round("nat_share", 6).alias("nat_share"),
            F.round("target_share", 6).alias("target_share"),
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def pack_sequences(
    df: DataFrame,
    context_len: int = 2048,
    num_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LM training layout:
    docs are deterministically pseudo-shuffled into ``num_shards`` shards,
    concatenated in shard order, and cut into fixed ``context_len``-token
    windows. Returns per-doc
    (id, shard, n_tokens, offset, chunk_start, chunk_end): the chunk range
    each document's tokens land in.

    Determinism: shard and intra-shard order come from the shared Lehmer
    mix of :func:`sample_mix_cols` (reproducible across runs, partitionings
    and engines — same rationale as mixture_plan's realization rule; k3's
    2^31-1 key space keeps >65k-doc shards free of the low-id ordering bias
    a 16-bit mix would have). Scale shape: ONE shuffle
    (hash-partition by shard) and a running-sum window per shard; shards
    are the packing parallelism unit, exactly how a real tokenizer-packer
    fans out at 10^12 docs.
    """
    from pyspark.sql import Window

    mix = sample_mix_cols(id_col)[2]
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(
        F.col(id_col),
        (mix % num_shards).alias("shard"),
        mix.alias("_mix"),
        toks.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("_mix", id_col)
    cum = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("offset"),
        F.floor((cum - F.col("n_tokens")) / context_len).alias("chunk_start"),
        F.floor((cum - 1) / context_len).alias("chunk_end"),
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int = 0,
    num_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle: every epoch (seed) induces a
    reproducible pseudo-random global order, materialized as
    (id, shard, pos) — shard files are written independently and read in
    (shard, pos) order by the training loader, the standard sharded-epoch
    layout.

    Order comes from a Knuth multiplicative mix of (id, seed) — identical
    across runs, partitionings and engines (the same determinism rationale
    as :func:`pack_sequences`), so an interrupted epoch resumes at the
    exact position. Scale shape: ONE hash shuffle on shard + a per-shard
    row_number window — shards are the parallelism unit; there is no
    global sort and no single-partition window at 10^12 docs.
    """
    from pyspark.sql import Window

    # Knuth multiplicative hash. The id is folded mod 2^31 BEFORE the
    # multiply so the product stays under int64 max at any id scale
    # (10^12-doc ids would otherwise silently wrap, diverging from the
    # documented order); ids ≥ 2^31 share mix keys with their mod-2^31
    # sibling, which only affects shuffle quality, never determinism —
    # the (key, id) tiebreak keeps the total order well-defined
    key = F.pmod(
        F.pmod(F.col(id_col) + F.lit(int(seed)), F.lit(2147483648))
        * F.lit(2654435761),
        F.lit(4294967296),
    )
    base = df.select(
        F.col(id_col),
        key.alias("_key"),
        F.pmod(key, F.lit(num_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return base.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).alias("pos"),
    )


def _ngram_features(toks, n_max: int = 2):
    """Unigram + bigram bag-of-words features, all JVM-side: tokens plus
    space-joined adjacent pairs (the hashed-n-gram feature map of DSIR —
    Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — uses exactly unigrams+bigrams). ``toks`` must be a
    MATERIALIZED token-array column, not the split expression itself —
    inlined, the split would be re-evaluated 5× per row (it appears in
    both slices, both slice bounds, and the final concat)."""
    if n_max < 2:
        return toks
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def dsir_weights(
    df: DataFrame,
    target_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = 10_000,
    smoothing: float = 1.0,
    target_filter=None,
) -> DataFrame:
    """DSIR importance weights — data selection via importance resampling
    (Xie et al. 2023, public): estimate unigram+bigram bag-of-words
    distributions p (target corpus) and q (raw corpus) over hashed feature
    buckets, then score every raw document with

        log w(x) = Σ_b  c_b(x) · ( log p̂_b − log q̂_b )

    with add-``smoothing`` estimates over the union feature space. High
    weights → raw docs that look like the target domain; the selection
    step keeps the top-k or samples ∝ w. Returns
    (id, n_features, log_weight).

    ``num_buckets=B`` hashes features with xxhash64 mod B (the paper's
    hashed feature map; collision noise vanishes as B grows).
    ``num_buckets=None`` uses the exact feature strings — engine-portable
    (no hash function in the result's data path), used by the DuckDB
    oracle; the hashed mode is the 100 TB path.

    The target is given EITHER as ``target_df`` (any corpus) or as
    ``target_filter`` (a Column predicate over ``df`` itself — the common
    "target = my in-domain subset" case). The filter form computes BOTH
    histograms in one explode pass with conditional counts — 2 corpus text
    scans total instead of 3, a third less I/O at 100 TB.

    Scale shape: one explode+groupBy per histogram pass (hashed: ≤B rows
    each — bounded regardless of corpus size), the log-ratio table joined
    onto exploded raw features (broadcast when hashed: B rows), and ONE
    groupBy(id) for the per-doc sum. Nothing iterates.
    """
    if (target_df is None) == (target_filter is None):
        raise ValueError("pass exactly one of target_df / target_filter")
    # tokens materialized once per pass (the feats expression references the
    # token array 5×; inlining the split would re-split the text 5× per row)
    feats = _ngram_features(F.col("_toks"))
    bucket = (
        F.pmod(F.xxhash64(F.col("_f")), F.lit(num_buckets))
        if num_buckets
        else F.col("_f")
    )

    if target_filter is not None:
        # one pass: per-bucket totals + target-subset counts together
        table = (
            df.select(
                target_filter.alias("_t"), _tokens(F.col(text_col)).alias("_toks")
            )
            .select("_t", F.explode(feats).alias("_f"))
            .select("_t", bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(
                F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t_n"),
                F.count(F.lit(1)).alias("r_n"),
            )
        )
    else:

        def histogram(frame):
            return (
                frame.select(_tokens(F.col(text_col)).alias("_toks"))
                .select(F.explode(feats).alias("_f"))
                .select(bucket.alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("n"))
            )

        t_hist = histogram(target_df).withColumnRenamed("n", "t_n")
        r_hist = histogram(df).withColumnRenamed("n", "r_n")
        table = t_hist.join(r_hist, "bucket", "full_outer").select(
            "bucket",
            F.coalesce("t_n", F.lit(0)).alias("t_n"),
            F.coalesce("r_n", F.lit(0)).alias("r_n"),
        )
    # materialize the (bounded: ≤B hashed / vocab-sized exact) histogram —
    # `tot` and the λ-table join below otherwise each re-run the corpus
    # explode pass, turning the documented 2-scan shape into 3 scans
    table = table.localCheckpoint()
    tot = table.agg(
        F.sum("t_n").alias("T"), F.sum("r_n").alias("R"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    s = float(smoothing)
    lam = table.select(
        "bucket",
        (
            F.log((F.col("t_n") + s) / F.lit(float(tot["T"]) + s * tot["V"]))
            - F.log((F.col("r_n") + s) / F.lit(float(tot["R"]) + s * tot["V"]))
        ).alias("lam"),
    )
    if num_buckets:
        lam = F.broadcast(lam)
    doc_feats = (
        df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(feats).alias("_f"))
        .select(id_col, bucket.alias("bucket"))
    )
    return (
        doc_feats.join(lam, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("lam").alias("log_weight"),
        )
    )


def _stratified_survivors(
    df: DataFrame,
    quota: int,
    strata_col: str,
    id_col: str,
    guard_min_stratum: int,
) -> DataFrame:
    """Census-driven hash-fraction pre-filter for viral strata: strata with
    more than ``guard_min_stratum`` rows keep only rows whose k3 mix falls
    below ``cap/n_s`` of the key space, where cap = 16*quota + 64. The
    survivor set contains the true top-``quota`` rows unless fewer than
    ``quota`` of a stratum's n_s uniform-ish 31-bit keys land in a window
    holding 16·quota+64 of them in expectation — a >10-sigma deviation even
    at quota=1 (mean 80 survivors, need <1). Small strata pass untouched.
    Returns (id, stratum, _k1, _k2, _k3)."""
    k1, k2, k3 = sample_mix_cols(id_col)
    base = df.select(
        F.col(id_col),
        F.col(strata_col).alias("stratum"),
        k1.alias("_k1"),
        k2.alias("_k2"),
        k3.alias("_k3"),
    )
    cap = 16 * quota + 64
    viral = (
        base.groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > F.lit(max(guard_min_stratum, cap)))
        .select(
            "stratum",
            F.ceil(F.lit(float(cap * _MIX_M1)) / F.col("_n"))
            .cast("long")
            .alias("_t"),
        )
    )
    return base.join(F.broadcast(viral), "stratum", "left").filter(
        F.col("_t").isNull() | (F.col("_k3") < F.col("_t"))
    )


def stratified_sample(
    df: DataFrame,
    quota: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    guard_min_stratum: int = 200_000,
) -> DataFrame:
    """EXACT-quota stratified sampling: keep precisely ``min(quota, n_s)``
    rows per stratum, chosen by a deterministic pseudo-random rank (the
    shared Lehmer-pair mix of :func:`sample_mix_cols` — reproducible across
    runs, partitionings and engines, collision-free over int64 ids).
    Returns (id, stratum, sample_rank) for the kept rows.

    This is the exact-count companion to :func:`mixture_plan`'s rate-based
    realization: rates give E[n]=quota, this gives n=quota — what a
    train/val split or a per-domain evaluation set needs.

    Scale shape: one cheap census agg (map-side combine, stratum-count
    rows), a hash-fraction PRE-FILTER on strata above ``guard_min_stratum``
    rows (keep iff k3 < (16·quota+64)·M/n_s — the same census+cap pattern
    as semantic_dedup's hot clusters), then one hash shuffle on the stratum
    + a per-stratum row_number window over the SURVIVORS only. Every window
    unit is therefore bounded: ≤ guard_min_stratum rows for small strata,
    ~16·quota+64 rows for viral ones — a 10^12-row single-domain stratum
    ranks ~quota·16 rows, not 10^12.
    """
    from pyspark.sql import Window

    survivors = _stratified_survivors(
        df, quota, strata_col, id_col, guard_min_stratum
    )
    w = Window.partitionBy("stratum").orderBy("_k3", "_k1", "_k2", id_col)
    ranked = survivors.select(
        F.col(id_col),
        "stratum",
        F.row_number().over(w).alias("sample_rank"),
    )
    return ranked.filter(F.col("sample_rank") <= quota)


def _curation_flags(df: DataFrame, text_col: str, id_col: str):
    """One-pass per-doc survival flags for the curation funnel: exact-dup
    first-occurrence (lowest id per exact text — dedup_exact's rule), C4
    page keep, Gopher keep. The only shuffle is the dedup rank on
    (xxhash64(text), text); every quality flag is a codegen Column."""
    from pyspark.sql import Window

    from quickwit_spark.functions.text import c4_keep_col, gopher_keep_col

    t = F.col(text_col)
    w = Window.partitionBy(F.xxhash64(t), t).orderBy(F.col(id_col))
    return df.select(
        F.col(id_col),
        t.alias(text_col),
        (F.row_number().over(w) == 1).alias("_first"),
        c4_keep_col(t).alias("_c4"),
        gopher_keep_col(t).alias("_gopher"),
    )


def curation_funnel(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The composed corpus-cleanup FUNNEL — how many documents survive each
    stage of the standard curation sequence exact-dedup → C4 → Gopher,
    applied cumulatively (every production data report leads with this
    table). Returns (stage_idx, stage, n_docs).

    Scale shape: flags in one pass (:func:`_curation_flags` — one text
    shuffle for the dedup rank), then ONE aggregation emits the whole
    funnel; adding a stage adds a conditional sum, never another scan.
    """
    flags = _curation_flags(df, text_col, id_col)
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    agg = flags.agg(
        F.count(F.lit(1)).alias("input"),
        cnt(F.col("_first")).alias("after_exact_dedup"),
        cnt(F.col("_first") & F.col("_c4")).alias("after_c4"),
        cnt(F.col("_first") & F.col("_c4") & F.col("_gopher")).alias("curated"),
    )
    stages = ("input", "after_exact_dedup", "after_c4", "curated")
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_idx"),
                        F.lit(s).alias("stage"),
                        F.col(s).alias("n_docs"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("f")
    ).select("f.*")


def curate_corpus(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The rows that survive the whole curation funnel (same flags, same
    single pass as :func:`curation_funnel`) — the input you'd hand to the
    mixture/packing stages."""
    flags = _curation_flags(df, text_col, id_col)
    return (
        flags.filter(F.col("_first") & F.col("_c4") & F.col("_gopher"))
        .drop("_first", "_c4", "_gopher")
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-row corpus summary — the "know your corpus" numbers every
    curation run starts and ends with: document count, total/mean token
    counts, exact doc-length quartiles, whitespace-vocabulary size and
    type-token ratio.

    Scale shape: per-doc token counts are one codegen pass; the length
    quartiles use exact ``percentile`` (linear interpolation — engine-
    portable for the oracle); vocab size is one explode + distinct-count
    aggregation (map-side partial). Corpus text is read twice, nothing is
    driver-sized but the one result row. At the 10^12-doc tier swap
    ``percentile`` → ``percentile_approx`` (mergeable t-digest, no
    per-group value buffer) and ``countDistinct`` →
    ``approx_count_distinct``; the plan shape is unchanged.
    """
    toks = _tokens(F.col(text_col))
    per_doc = df.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda w: F.length(w) > 0)).alias("n_tokens"),
    )
    base = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.expr("percentile(n_tokens, 0.25)").alias("p25_tokens"),
        F.expr("percentile(n_tokens, 0.5)").alias("p50_tokens"),
        F.expr("percentile(n_tokens, 0.75)").alias("p75_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
    vocab = (
        df.select(F.explode(toks).alias("w"))
        .filter(F.length("w") > 0)
        .agg(F.countDistinct("w").alias("vocab_size"))
    )
    return base.crossJoin(vocab).select(
        "n_docs", "total_tokens", "mean_tokens", "min_tokens",
        F.round("p25_tokens", 6).alias("p25_tokens"),
        F.round("p50_tokens", 6).alias("p50_tokens"),
        F.round("p75_tokens", 6).alias("p75_tokens"),
        "max_tokens", "vocab_size",
        F.round(F.col("vocab_size") / F.col("total_tokens"), 6).alias(
            "type_token_ratio"
        ),
    )


def pack_sequences_nocross(
    df: DataFrame,
    context_len: int = 2048,
    num_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Doc-boundary-respecting packing: no document crosses a chunk
    boundary (the padding-vs-concat trade-off's other side —
    :func:`pack_sequences` is the zero-padding concat-and-chunk form).
    Docs are deterministically sharded (same LCG mix as pack_sequences),
    then each shard runs BEST-FIT-DECREASING over (n_tokens desc, id):
    each doc goes to the fullest chunk it still fits in, else opens a new
    chunk. Over-long docs take a chunk alone, truncated to
    ``context_len`` and flagged. Returns
    (id, shard, n_tokens, chunk, offset, truncated); chunk ids are dense
    per shard and offsets are within-chunk.

    Determinism: shard and packing order are pure functions of (id,
    n_tokens) — reproducible across runs and partitionings. Scale shape:
    ONE shuffle (groupBy shard → applyInPandas); the greedy is sequential
    per shard, so shards are the parallelism unit, exactly like a real
    tokenizer-packer fan-out. Bin search is a sorted-remaining-capacity
    bisect — O(n log n) per shard.
    """
    import bisect

    import pandas as pd

    mix = sample_mix_cols(id_col)[2]
    toks = F.size(F.filter(_tokens(F.col(text_col)), lambda w: F.length(w) > 0))
    base = df.select(
        F.col(id_col),
        (mix % num_shards).cast("int").alias("shard"),
        toks.alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # parallel sorted lists: remaining capacity (asc) + chunk id
        rem: list[int] = []
        rem_chunk: list[int] = []
        filled: dict[int, int] = {}
        next_chunk = 0
        out_chunk, out_offset, out_trunc, out_ntok = [], [], [], []
        for n in pdf["n_tokens"].tolist():
            take = min(int(n), context_len)
            trunc = int(n) > context_len
            # fullest chunk that still fits == smallest remaining >= take
            i = bisect.bisect_left(rem, take)
            if i < len(rem) and not trunc:
                chunk = rem_chunk.pop(i)
                r = rem.pop(i)
                off = filled[chunk]
                filled[chunk] = off + take
                r -= take
                j = bisect.bisect_left(rem, r)
                rem.insert(j, r)
                rem_chunk.insert(j, chunk)
            else:
                chunk = next_chunk
                next_chunk += 1
                off = 0
                filled[chunk] = take
                if not trunc:
                    r = context_len - take
                    j = bisect.bisect_left(rem, r)
                    rem.insert(j, r)
                    rem_chunk.insert(j, chunk)
            out_chunk.append(chunk)
            out_offset.append(off)
            out_trunc.append(trunc)
            out_ntok.append(take)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "shard": pdf["shard"],
                "n_tokens": out_ntok,
                "chunk": out_chunk,
                "offset": out_offset,
                "truncated": out_trunc,
            }
        )

    schema = (
        f"{id_col} long, shard int, n_tokens int, chunk long, "
        "offset long, truncated boolean"
    )
    return base.groupBy("shard").applyInPandas(pack, schema=schema)


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF — the classic corpus
    summarization / topic-labeling pass of a training-data pipeline
    (keyword metadata for mixture planning and quality triage).

    score(term, doc) = tf · (ln((N+1)/(df+1)) + 1)   (smoothed idf, always
    positive, so raw-count tf needs no per-doc normalization for ranking);
    ties break by term ascending — fully deterministic.

    Scale shape: one explode + groupBy(doc, term) with map-side combine
    (the heavy shuffle, ~unique-terms-per-doc rows); df comes from a
    SECOND aggregation over that same deduplicated frame (term cardinality
    ≪ token count — never re-reads text) joined back on term (AQE
    broadcast when vocab is small); top-k is a window partitioned by doc
    — per-group state is bounded by the doc's vocabulary, no global sort.
    Nothing is driver-sized.
    """
    from pyspark.sql import Window

    toks = F.filter(_tokens(F.col(text_col)), lambda w: F.length(w) > 0)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n")).crossJoin(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") >= min_df
        )
    )
    scored = tf.join(n_docs, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "tfidf")
    )


def chunk_sliding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
    keep_text: bool = True,
) -> DataFrame:
    """Sliding-window document chunking — the RAG / long-context prep step:
    split each document into windows of ``chunk_tokens`` whitespace tokens
    with ``overlap`` tokens shared between consecutive windows (stride =
    chunk_tokens − overlap). The final window is the tail remainder (may
    be shorter); a document shorter than one window yields exactly one
    chunk. Token positions are preserved as [token_start, token_end) so
    downstream spans (loss masks, retrieval offsets) can map back into the
    source document.

    Unlike :func:`pack_sequences` (which concatenates documents into
    training rows), chunking SUBDIVIDES single documents for embedding /
    retrieval — the other half of the long-document story.

    Scale shape: pure codegen, ZERO shuffles — tokenize, size, and a
    posexplode over ``sequence(0, n_chunks−1)`` all happen in the scan's
    own stage; chunk text is an ``array_join(slice(...))`` over the
    already-materialized token array. Output volume is input tokens ×
    (chunk/(chunk−overlap)) — the overlap factor is the only amplification
    and it is a constant chosen by the caller.

    Returns (id, chunk_idx, token_start, token_end, n_tokens[, chunk_text]).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    base = df.select(F.col(id_col), toks.alias("__t")).withColumn(
        "__n", F.size("__t")
    )
    # windows fully inside the doc: 1 + floor((n - chunk - 1)/stride) extra
    # full-or-tail windows; equivalently ceil(max(n - overlap, 1) / stride)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__n") - F.lit(overlap)).cast("double") / F.lit(stride)),
    ).cast("int")
    out = base.select(
        id_col,
        "__t",
        "__n",
        F.posexplode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias(
            "chunk_idx", "__i"
        ),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("__i") * stride).cast("long").alias("token_start"),
        F.least(F.col("__i") * stride + chunk_tokens, F.col("__n"))
        .cast("long")
        .alias("token_end"),
        F.col("__t").alias("__t"),
    ).withColumn(
        "n_tokens", (F.col("token_end") - F.col("token_start")).cast("long")
    )
    if keep_text:
        out = out.withColumn(
            "chunk_text",
            F.array_join(
                F.slice(
                    "__t",
                    (F.col("token_start") + 1).cast("int"),
                    F.col("n_tokens").cast("int"),
                ),
                " ",
            ),
        )
    return out.drop("__t")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row draws u = (k3+1)/M1 from its
    id's Lehmer mix and is ranked by key = ln(u)/w (the log form of
    u^(1/w) — same order, no overflow); the global top-k by key is the
    sample. Inclusion probability is proportional to weight without ever
    materializing a cumulative distribution, and the draw is a pure
    function of (id, weight) — reproducible across runs, engines, and
    partitionings.

    Scale shape: key computation is row-local codegen; the top-k is
    TakeOrdered (per-partition heads, no full sort, no shuffle of
    non-candidates). Rows with weight <= 0 or null are excluded (zero mass).

    Returns the sampled rows + sample_key (rounded to 6 dp for display;
    ordering/selection uses the unrounded key).
    """
    u = (sample_mix_cols(id_col)[2] + 1).cast("double") / F.lit(float(_MIX_M1))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_skey", key)
        .orderBy(F.col("_skey").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("sample_key", F.round(F.col("_skey"), 6))
        .drop("_skey")
    )


def dataset_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Group-aware deterministic train/val/test assignment: every row of a
    group (conversation, document cluster, user) lands in the SAME split —
    the leakage rule transcript pipelines must enforce (a conversation with
    turns in both train and eval contaminates the eval set). Assignment
    hashes the group id (full-string portable hash for strings, identity
    for ints) through the Lehmer mix and cuts [0, M1) at exact integer
    thresholds floor(cum_fraction * M1) — pure codegen, no UDF, engine-
    portable, independent of partitioning and of which rows are present
    (adding rows to a group can never move the group).

    ``fractions`` maps split name -> fraction; they must sum to ~1 (the
    last split absorbs rounding). Returns df + split.
    """
    from .sketches import mix_cols, portable_string_hash

    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    dtype = dict(df.dtypes)[group_col]
    gid = (
        portable_string_hash(F.col(group_col))
        if dtype == "string"
        else F.col(group_col).cast("long")
    )
    k3 = mix_cols(gid)[2]
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cut = int(cum * _MIX_M1)
        expr = (
            F.when(k3 < cut, F.lit(name))
            if expr is None
            else expr.when(k3 < cut, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Collocation mining by pointwise mutual information — the
    text-analysis step that surfaces multi-word expressions ("new york",
    "stack trace") for tokenizer/phrase-dictionary construction.

    PMI(w1,w2) = ln( (c12/Nb) / ((c1/Nu)·(c2/Nu)) ) with c12 = bigram
    count, c1/c2 = unigram counts, Nb/Nu = total bigram/unigram tokens —
    all exact integers, so the score is bit-reproducible across engines
    (rounded to 6 dp). ``min_count`` floors c12 (PMI is noise-dominated at
    low counts); output is the top_k by (pmi desc, w1, w2) total order.

    Scale shape: one tokenize pass feeds both count aggregations (each
    map-side combined, shuffle width = vocab / bigram-vocab); the totals
    come out of ONE extra driver-sized agg job; the c1/c2 attachment is a
    conditional-broadcast join of the unigram table (same vocab-estimate
    rule as bigram_lm_scores — catalog-sized vocabularies broadcast, huge
    ones fall back to Spark's join choice). TakeOrdered finishes — no
    global sort.
    """
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("t"))
    totals = toks.agg(
        F.sum(F.size("t")).alias("nu"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("nb"),
    ).collect()[0]
    nu, nb = int(totals["nu"]), int(totals["nb"])
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at("t", i + 1).alias("w1"),
                        F.element_at("t", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bi = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    # conditional broadcast WITHOUT an extra count job (ADVICE r5): the
    # totals row already gives nu, and vocab ≤ nu always (heaps-law makes
    # it far smaller); nu ≤ 5M tokens is a cost-free sufficient condition
    # for a broadcastable unigram table — the same estimate-not-measure
    # rule as bigram_lm_scores. Huge corpora fall through to Spark's own
    # join choice exactly as before.
    est_small = nu <= 5_000_000
    maybe_bc = (lambda f: F.broadcast(f)) if est_small else (lambda f: f)
    scored = (
        bi.join(
            maybe_bc(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            maybe_bc(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12").cast("double") / F.lit(float(nb)))
                    / (
                        (F.col("c1").cast("double") / F.lit(float(nu)))
                        * (F.col("c2").cast("double") / F.lit(float(nu)))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(top_k)
