"""Data-selection operators for training-corpus curation.

DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) — scores every raw document by how target-like its
token distribution is:

    w(doc) = sum over tokens t in doc of  count_doc(t) * ln( p_target(t) / p_raw(t) )

where p_target / p_raw are Laplace-smoothed unigram distributions
estimated from a (small) target corpus and the full raw corpus.
Resampling the raw corpus with probabilities proportional to exp(w)
yields a target-shaped subset; in practice pipelines keep the top-k
by w or use Gumbel-top-k on w.

Spark shape (100 TB reasoning):
- ONE explode of the raw corpus feeds BOTH distribution estimates —
  the target is a filtered view of the same exploded tokens, so the
  expensive tokenize+explode scan happens once.
- Both vocab tables are token-keyed aggregates (map-side partial
  combine collapses heavy hitters before the exchange).
- The per-token log-ratio table is vocabulary-sized (millions of rows,
  not corpus-sized). It joins back to the exploded tokens on the token
  key; at real vocabularies that join BROADCASTs.
- Per-doc weight is then one groupBy(doc_id) sum — shuffle keyed on
  doc_id with map-side partials.

The published method hashes n-grams into 2^k buckets so the vocab
table has a fixed size; here features are the raw token strings so the
DuckDB oracle can reproduce the arithmetic exactly (the hash only
changes the feature key, not the plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline.text import tokens


def dsir_weights(
    df: DataFrame,
    target_filter,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance weight against a target subset.

    ``target_filter`` is a Column predicate selecting the target subset
    of ``df`` (e.g. ``F.col("source") == "src0"``). Returns
    ``(doc_id, n_tokens, weight)``; ``weight`` is the summed log
    importance ratio rounded to 6 dp and cast DECIMAL(18,6) so both
    engines render it identically (same hash-hardening as key_skew).

    Smoothing: p(t) = (c(t) + alpha) / (N + alpha * V) with V = size of
    the RAW vocabulary; target counts are 0 for raw-only tokens, so every
    raw token has a finite ratio and the weight is total.

    Determinism: each token's log-ratio is rounded to 9 dp and cast to
    DECIMAL(20,9) BEFORE the per-doc sum. A double sum is
    order-dependent, so the same corpus could score differently under a
    different partitioning (or engine); summing fixed-point terms is
    exact and associative, so the weight is bit-stable under
    repartitioning and reproducible in the DuckDB oracle.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target_filter.alias("is_target"),
        F.explode(tokens(F.col(text))).alias("tok"),
    )
    per_tok = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = per_tok.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    ratios = per_tok.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.round(
            F.log((F.col("c_tgt") + alpha) / (F.col("n_tgt") + alpha * F.col("vocab")))
            - F.log((F.col("c_raw") + alpha) / (F.col("n_raw") + alpha * F.col("vocab"))),
            9,
        )
        .cast("decimal(20,9)")
        .alias("log_ratio"),
    )
    return (
        toks.join(F.broadcast(ratios), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("log_ratio").alias("_w"),
        )
        .select(
            "doc_id",
            "n_tokens",
            # exact 6-dp decimal, then DOUBLE out: the decimal pins the
            # exact value across engines; the double survives pandas
            # coercion identically on both sides (a Decimal output
            # becomes object-vs-float64 there and hash-mismatches)
            F.round(F.col("_w"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("weight"),
        )
    )


def dsir_topk(
    df: DataFrame,
    target_filter,
    k: int,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Top-k raw documents by DSIR weight (deterministic tie-break on
    doc_id) — the selection step itself, as a TakeOrdered (no global
    sort materialization)."""
    w = dsir_weights(df, target_filter, text=text, id_col=id_col, alpha=alpha)
    return w.orderBy(F.col("weight").desc(), "doc_id").limit(k)


def hashed_classifier_scores(
    df: DataFrame,
    dim: int = 4096,
    threshold: float = 0.0,
    text: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """fastText-style linear quality classifier over hashed bag-of-words
    features — the model-based filtering stage of the GPT-3/LLaMA data
    pipelines (Brown et al. 2020 §A; Touvron et al. 2023 use a fastText
    classifier the same way). Architecture is the real thing:

        bucket(tok) = poly_hash_31(tok) mod dim        (feature hashing)
        score(doc)  = mean over tokens of W[bucket(tok)]

    The weight vector is where a trained model would plug in; since no
    training framework ships in this container, W is a DETERMINISTIC
    stand-in — W[b] = ((b*2654435761 + 104729) mod 2001) - 1000, integers
    in [-1000, 1000] — so the whole scorer is integer-exact and the
    DuckDB oracle replays it bit-for-bit (same stub philosophy as the
    multimodal codecs: the Spark plumbing is real, the learned artifact
    is faked deterministically).

    Scale shape: expression-only (nested higher-order functions inside
    whole-stage codegen), zero shuffles, zero UDFs; a real W of size
    ``dim`` rides along as a broadcast literal array exactly like the
    stand-in does. Returns (id, n_tokens, score DECIMAL(18,6), keep).
    """
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        *_classifier_cols(dim, threshold, text),
    )


def _classifier_cols(dim: int, threshold: float, text: str) -> list:
    # the ONE base-31 polynomial hash (text._poly_hash) — hashed_features
    # and count_min_table share it, so a hash fix lands everywhere at once
    from nnanalytics_spark.pipeline.text import _poly_hash

    toks = tokens(F.col(text))
    weight = lambda t: (  # noqa: E731
        (_poly_hash(t, 31) % dim) * F.lit(2654435761) + 104729
    ) % 2001 - 1000
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, weight), F.lit(0).cast("long"), lambda a, w: a + w
    )
    score = F.when(n > 0, F.round(total / n, 6)).otherwise(F.lit(0.0)).cast(
        "decimal(18,6)"
    )
    # keep compares on the exact decimal; the emitted score is the DOUBLE
    # nearest that decimal in both engines (pandas-coercion-stable)
    return [
        n.alias("n_tokens"),
        score.cast("double").alias("score"),
        (score >= threshold).alias("keep"),
    ]


def top_fraction_per_group(
    df: DataFrame,
    frac: float,
    score_col: str = "score",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quantile curation: keep the top ``frac`` of rows by
    score WITHIN each group — the per-domain percentile cut used after
    model-based scoring (sources differ in score distribution, so one
    global threshold over- or under-selects entire domains).

    Exact semantics: rows ranked by (score desc, id) inside each group;
    keep rank <= ceil(frac * group_size). Deterministic under ties.

    Scale: one shuffle on ``group_col`` + a per-group window sort. At
    100 TB the window sort over the largest domain is the cost center;
    the production flip is a two-pass threshold — per-group
    approx_percentile(score, 1-frac) (one agg, map-side combinable) then
    a broadcast-joined filter ``score >= t_g`` — trading exact group
    sizes for no sort. Same output columns either way.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.col(score_col).desc(), F.col(id_col))
    ranked = df.withColumn("rank", F.row_number().over(w)).withColumn(
        "group_n", F.count(F.lit(1)).over(W.partitionBy(group_col))
    )
    return ranked.filter(
        F.col("rank") <= F.ceil(F.lit(frac) * F.col("group_n"))
    ).drop("group_n")


def source_divergence(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    source: str = "source",
) -> DataFrame:
    """Per-source KL divergence from the corpus token distribution,
    KL(P_source || P_corpus) = sum_w P_s(w)·ln(P_s(w)/P(w)) — the
    data-mixing diagnostic for "which sources are redundant with the
    blend vs contributing distinct mass" (the quantity behind
    distributionally-targeted mixing, e.g. DoReMi/DSIR-style reweighting
    decisions). No smoothing is needed: every token of a source exists
    in the corpus, so P(w) > 0 wherever P_s(w) > 0.

    Exactness: each per-token term is computed from four INTEGER counts,
    rounded to 6 dp and summed as DECIMAL(18,6) — the same
    order-independence hardening as bigram_lm_scores, so an engine
    oracle hash-matches the totals. Plan: one explode, a (source, token)
    count, corpus counts AGGREGATED FROM that table (token-keyed, no
    second corpus scan), broadcast-able totals, one final per-source
    aggregate.

    Returns (source, n_tokens, n_distinct, kl_nats DECIMAL(18,6)).
    """
    from nnanalytics_spark.pipeline.text import tokens

    toks = df.select(
        F.col(source).alias("src"),
        F.explode(tokens(F.lower(F.col(text)))).alias("tok"),
    )
    st = toks.groupBy("src", "tok").agg(F.count(F.lit(1)).alias("c_st"))
    ct = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    ns = st.groupBy("src").agg(F.sum("c_st").alias("n_s"))
    n_total = st.agg(F.sum("c_st").alias("n")).select("n")
    term = (
        st.join(ct, "tok")
        .join(ns, "src")
        .crossJoin(F.broadcast(n_total))
        .select(
            "src",
            "c_st",
            F.round(
                (F.col("c_st") / F.col("n_s"))
                * F.log(
                    (F.col("c_st").cast("double") * F.col("n"))
                    / (F.col("n_s").cast("double") * F.col("c_t"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("kl_term"),
        )
    )
    return term.groupBy(F.col("src").alias("source")).agg(
        F.sum("c_st").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        # DECIMAL-exact sum, DOUBLE out (pandas-coercion-stable)
        F.sum("kl_term").cast("double").alias("kl_nats"),
    )


def budget_fill(
    df: DataFrame,
    char_budget: int,
    group_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain token-budget fill — the selection step that follows
    mixture planning (temperature_mixture decides each domain's BUDGET;
    this decides which documents spend it): within each domain, take
    documents in quality order until the cumulative size exceeds the
    budget. Quality here = (size desc, id asc) — swap in a classifier
    score column upstream without changing the shape.

    One window running-sum per domain (a single keyed exchange; the
    running sum needs no second pass because the INCLUSIVE prefix sum
    decides membership: a doc is kept iff its own arrival still fits).
    Report per domain: docs seen/kept, chars kept, budget utilization.
    At 100 TB the window sort is per-domain and spills gracefully;
    domains are independent so skew is bounded by the largest domain.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(size_col).desc(), F.col(id_col)
    )
    cum = F.sum(size_col).over(w)
    kept = df.select(group_col, size_col, id_col).withColumn("_cum", cum).filter(
        F.col("_cum") <= char_budget
    )
    totals = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    report = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(size_col).alias("chars_kept"),
    )
    return (
        totals.join(report, group_col, "left")
        .select(
            group_col,
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("chars_kept", F.lit(0)).alias("chars_kept"),
            # integer/int division in double is IEEE-identical cross-engine
            F.round(
                F.coalesce("chars_kept", F.lit(0)) / F.lit(char_budget), 6
            ).alias("budget_frac"),
        )
        .orderBy(group_col)
    )
