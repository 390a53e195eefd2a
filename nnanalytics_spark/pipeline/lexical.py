"""Sparse lexical similarity — TF-vector cosine over an inverted index.

The third near-dup modality next to set-based n-gram Jaccard
(pipeline/dedup.py) and dense embedding cosine (pipeline/similarity.py):
term-frequency-weighted overlap catches "same words, different mix"
pairs that set Jaccard under-scores and embedding models over-smooth.

Built entirely from DataFrame ops: tokenize → per-(doc, token) term
frequency → token-keyed self-join (the inverted index — the pair space
never materializes beyond co-occurring candidates) → one aggregate for
the dot product, with norms carried on the postings. All arithmetic
before the final divide is INTEGER (tf products and squared norms), so
a SQL oracle hash-matches exactly; sqrt/divide are IEEE-correctly
rounded in both engines.

Skew control is stop-wording by document frequency: tokens appearing in
more than ``max_token_df`` documents are dropped from the VOCABULARY
(vectors and norms alike, so the cosine stays exact over the filtered
vocabulary — standard lexical practice, and the analog of dedup.py's
hot-shingle bound: a token with document frequency d contributes d²
join rows, so the unbounded index is quadratic in the hottest token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline.text import tokens


def lexical_cosine_pairs(
    df: DataFrame,
    threshold: float,
    text: str = "text",
    id_col: str = "doc_id",
    max_token_df: int | None = None,
) -> DataFrame:
    """All document pairs with TF-cosine ≥ threshold over the (optionally
    stop-worded) vocabulary.

    Plan shape: tf table (one explode + one groupBy) → window document
    frequency riding a token-hash exchange → self-join on the 8-byte
    token hash → per-pair integer dot product → norms joined onto the
    AGGREGATED pair table. Norms deliberately do NOT ride the postings
    as a carried window column: a per-id window between the tk-window
    and the tk-join repartitions every posting by id on both join
    sides (A/B at sf0.1: 5.4 s cold / 1.2 s warm carried vs 1.5 s /
    1.0 s here). The norm joins key the doc id against the pair
    table — |pairs| rows, the same bounded shape dedup.py uses for
    hot-shingle lists; AQE broadcasts the norm table when it is small.
    """
    from pyspark.sql import Window as W

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.lower(F.col(text)))).alias("tok"),
        )
        .groupBy("id", F.xxhash64("tok").alias("tk"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_token_df is not None:
        tf = tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("tk"))).filter(
            F.col("df") <= max_token_df
        ).drop("df")
    norms = tf.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("nrm2"))
    a, b = tf.alias("a"), tf.alias("b")
    dots = (
        a.join(b, (F.col("a.tk") == F.col("b.tk")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("id").alias("id_a"), F.col("nrm2").alias("nrm2_a")), "id_a")
        .join(norms.select(F.col("id").alias("id_b"), F.col("nrm2").alias("nrm2_b")), "id_b")
        .withColumn(
            "cos_sim",
            F.round(F.col("dot") / (F.sqrt("nrm2_a") * F.sqrt("nrm2_b")), 6),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def token_cooccurrence(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_vocab: int = 40,
    top_pairs: int = 50,
) -> DataFrame:
    """Document-level token co-occurrence counts — the exact-count
    prep for PMI / collocation scoring (the association stage of a
    phrase-mining or tokenizer-vocab pipeline). Emits the ``top_pairs``
    most co-occurring unordered token pairs with their joint and
    marginal document frequencies; the (deliberately float-free) counts
    are everything PMI needs: pmi = ln(n_ab * n_docs / (n_a * n_b)).

    Scale shape: marginal document frequencies come from one keyed
    aggregate; the vocabulary is then capped to the ``top_vocab`` most
    frequent tokens (deterministic (df desc, token) order), which rides
    every executor as a broadcast semi-join — so the per-document
    pair explosion is bounded by C(top_vocab, 2) regardless of document
    length, and the pair aggregate's key space by top_vocab². The
    doc-keyed self-join shuffles postings once on the 8-byte doc id.
    Counts are df-style (per-doc distinct), so a token repeated in one
    document still counts one co-occurrence — that is what makes the
    marginals consistent with the joint.
    """
    post = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.lower(F.col(text)))).alias("tok"))
        .distinct()
    )
    vocab = (
        post.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
        .orderBy(F.col("n_tok").desc(), "tok")
        .limit(top_vocab)
    )
    kept = post.join(F.broadcast(vocab), "tok")
    a = kept.select(F.col("id"), F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    b = kept.select(F.col("id"), F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    pairs = (
        a.join(b, "id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.count(F.lit(1)).alias("n_ab"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return (
        pairs.orderBy(F.col("n_ab").desc(), "tok_a", "tok_b")
        .limit(top_pairs)
        .select("tok_a", "tok_b", "n_ab", "n_a", "n_b")
    )


def rake_keywords(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010) —
    the unsupervised keyphrase scorer a corpus-exploration pass runs
    before building taxonomies or search facets: candidate phrases are
    the maximal stopword-free token runs, a word scores
    degree/frequency (degree = Σ length of the phrases it appears in —
    words that live in long multiword phrases outrank isolated
    frequent ones), and a phrase scores the sum of its words' scores.

    Returns the global top ``top_k`` phrases by (score desc, phrase
    asc): phrase, n_occurrences, n_words, score.

    Plan: posexplode → per-doc stopword-prefix-count window (phrase
    group ids; partitioned by doc, never global) → one keyed aggregate
    per (doc, group) for phrases → word stats as two keyed aggregates
    → a broadcast word-score join back. Word scores quantize to 9-dp
    DECIMAL before the per-phrase sum, so identical phrases score
    bit-identically in any engine and the final ranking is exact.
    Whitespace tokens (punctuation rides its word — the corpus
    tokenizer's contract); pass a custom ``stopwords`` list to widen
    phrase boundaries."""
    from pyspark.sql.window import Window as W

    from nnanalytics_spark.pipeline.text import STOPWORDS

    sw = stopwords if stopwords is not None else STOPWORDS
    dec = "decimal(18,9)"
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.lower(F.col(text)))).alias("pos", "tok"),
    )
    grp = F.sum(F.col("tok").isin(sw).cast("int")).over(
        W.partitionBy("_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    )
    words = (
        toks.withColumn("_grp", grp)
        .filter(~F.col("tok").isin(sw))
        .select("_id", "_grp", "pos", "tok")
    )
    phrases = words.groupBy("_id", "_grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    occ = words.join(phrases.select("_id", "_grp", "plen"), ["_id", "_grp"])
    wstats = occ.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    )
    wscore = wstats.select(
        "tok",
        F.round(F.col("degree") / F.col("freq"), 9).cast(dec).alias("wscore"),
    )
    # no broadcast hint: the word-score side is vocabulary-sized
    # (unbounded at corpus scale) — let AQE pick the strategy
    pscore = (
        words.join(wscore, "tok")
        .groupBy("_id", "_grp")
        .agg(F.sum("wscore").alias("_ps"))
    )
    ranked = (
        phrases.join(pscore, ["_id", "_grp"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("plen").alias("n_words"),
            F.round(F.max("_ps").cast("double"), 6).alias("score"),
        )
    )
    return ranked.orderBy(F.col("score").desc(), "phrase").limit(top_k)
