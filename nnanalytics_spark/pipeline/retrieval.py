"""Lexical retrieval — BM25 scoring over the corpus (Robertson/Sparck
Jones probabilistic relevance, the standard Okapi BM25 formula).

Training-data pipelines use exactly this shape for decontamination and
eval-set leakage checks ("which corpus documents score high against a
benchmark query?"), and it is the lexical complement to the dense ANN
path in pipeline/similarity.py.

Spark-first plan: the query-term filter lands directly on the exploded
token stream (predicate pushdown keeps only postings for |query| terms),
so the big corpus is touched by ONE scan; document frequencies for the
query terms aggregate to |query| rows and broadcast back; document
lengths are a per-doc attribute joined only onto the candidate set. No
UDFs — log/arithmetic are codegen expressions that are IEEE-identical
in DuckDB, and scores are rounded to 6 dp BEFORE the top-k sort so the
k-boundary tie-break (doc_id asc) is engine-independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline.text import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (non-negative variant)
    score  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Candidate set = documents containing ≥1 query term. At 100 TB the
    token explode feeds a filter on |query| literals (no vocabulary-wide
    shuffle); the df table is |query| rows (broadcast); the dl join keys
    the candidate ids against a per-doc attribute — the one real keyed
    join, and AQE broadcasts the df side unconditionally.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text)))).alias("tok"),
    )
    dl = df.select(
        F.col(id_col).alias("id"), F.size(tokens(F.lower(F.col(text)))).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(list(query_terms)))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )
