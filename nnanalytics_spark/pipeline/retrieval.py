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


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k_const: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (Cormack et al.:
    score(d) = Σ_lists 1/(k + rank_list(d))) — the standard way to merge a
    lexical ranking (bm25_topk) with a dense one (brute_force_topk /
    ivf_topk) without score calibration.

    Determinism + scale notes: each input is already a bounded top-k list
    (that is RRF's contract — rank positions only exist within a finite
    list), so the per-list row_number window over ≤k rows is not a scale
    hazard; the fusion itself is a union + one hash aggregate on the id.
    Fused scores are kept in INTEGER picos — contribution
    floor(1e12/(k + rank)) — so the sum is order-free and engine-exact
    (a float Σ 1/(k+r) would be addition-order-dependent under hash
    aggregation); the 1e-12 quantization cannot reorder ranks because
    distinct reciprocal gaps at k≤10000 exceed 1e-8."""
    from pyspark.sql import Window as W

    ranked = []
    for i, r in enumerate(rankings):
        w = W.orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(
            r.select(
                F.col(id_col).alias("id"),
                F.row_number().over(w).alias("rank"),
                F.lit(i).alias("list_id"),
            )
        )
    uni = ranked[0]
    for r in ranked[1:]:
        uni = uni.unionByName(r)
    fused = (
        uni.withColumn(
            "contrib", F.floor(F.lit(10**12) / (F.lit(k_const) + F.col("rank")))
        )
        .groupBy("id")
        .agg(
            F.sum("contrib").alias("rrf_picos"),
            F.count(F.lit(1)).alias("n_lists"),
        )
    )
    return (
        fused.orderBy(F.desc("rrf_picos"), F.asc("id"))
        .limit(topk)
        .select(F.col("id").alias(id_col), "rrf_picos", "n_lists")
    )


def mmr_rerank(
    pool: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein) of a
    BOUNDED candidate pool: iteratively pick
    argmax_d lam·rel(d) − (1−lam)·max_{s∈selected} cos(d, s),
    emitting the pick order. The greedy loop is inherently sequential in
    k, so it runs as ONE applyInPandas task per pool — correct at scale
    because the pool is top-n-bounded BY CONSTRUCTION upstream (an ANN /
    BM25 candidate step); with ``group_cols`` (e.g. query_id) thousands of
    pools rerank in parallel, one task each, and the big corpus is only
    touched by the candidate-generation scan that produced the pools.

    Engine parity: scores are rounded to 6 dp before each argmax and ties
    break on ascending id — the same quantized-boundary recipe the cosine
    pair ops use — so an unrolled per-step SQL oracle reproduces the pick
    sequence exactly."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    gcols = list(group_cols)
    out_schema = StructType(
        [pool.schema[c] for c in gcols]
        + [
            StructField(id_col, LongType()),
            StructField("pick", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def select_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        rel = pdf[rel_col].to_numpy(dtype=np.float64)[order]
        mat = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()[order]]
        )
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sims = np.round(unit @ unit.T, 6)
        chosen: list[int] = []
        remaining = list(range(len(ids)))
        scores: list[float] = []
        for _step in range(min(k, len(ids))):
            if chosen:
                penalty = sims[np.ix_(remaining, chosen)].max(axis=1)
            else:
                penalty = np.zeros(len(remaining))
            cand = np.round(
                lam * np.round(rel[remaining], 6) - (1.0 - lam) * penalty, 6
            )
            # ids are ascending within `remaining`, so argmax's first-max
            # rule IS the ascending-id tie-break
            best = int(np.argmax(cand))
            scores.append(float(cand[best]))
            chosen.append(remaining.pop(best))
        res = pd.DataFrame(
            {
                id_col: ids[chosen],
                "pick": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "mmr_score": scores,
            }
        )
        for c in gcols:
            res.insert(0, c, pdf[c].iloc[0])
        return res

    if gcols:
        return pool.groupBy(*gcols).applyInPandas(select_block, out_schema)
    return pool.withColumn("__g", F.lit(0)).groupBy("__g").applyInPandas(
        lambda pdf: select_block(pdf.drop(columns="__g")), out_schema
    )


def ndcg_at_k(
    judged: DataFrame,
    k: int = 10,
    query_col: str = "query",
    id_col: str = "doc_id",
    gain_col: str = "gain",
    score_col: str = "score",
) -> DataFrame:
    """NDCG@k per query over a judged candidate frame (one row per
    (query, doc) with an integer relevance ``gain`` and the ranker's
    ``score``): DCG over the score ranking, normalized by the ideal
    (gain-sorted) DCG, deterministic doc-id tie-breaks on both.

    Determinism across engines: the 1/log2(rank+1) discounts are PYTHON
    literal doubles baked into the plan (an oracle interpolates the same
    repr()s — bit-identical, no libm log2 in either engine's hot path),
    each rank's contribution is quantized to DECIMAL(28,9) so the two
    sums are order-free exact, and the final ratio divides as double
    then rounds to 6.

    Scale: two row_number windows partitioned by QUERY — the judged
    frame is (queries × candidates with gain > 0), not the corpus, so a
    partition is one query's candidate list (docs with gain 0 rank
    below every positive candidate and contribute 0 to both sums, so
    pre-filtering them upstream leaves NDCG unchanged — do it). Caller
    owns candidate generation; this is the metric, not the ranker.
    """
    import math

    from pyspark.sql.window import Window

    discounts = F.array(
        *[F.lit(1.0 / math.log2(i + 1)) for i in range(1, k + 1)]
    )
    w_rank = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(gain_col).desc(), F.col(id_col).asc()
    )
    ranked = judged.select(
        query_col,
        gain_col,
        F.row_number().over(w_rank).alias("_rnk"),
        F.row_number().over(w_ideal).alias("_irnk"),
    )
    term = F.round(
        F.col(gain_col) * F.element_at(discounts, F.col("_rnk")), 9
    ).cast("decimal(28,9)")
    ideal_term = F.round(
        F.col(gain_col) * F.element_at(discounts, F.col("_irnk")), 9
    ).cast("decimal(28,9)")
    return (
        ranked.groupBy(query_col)
        .agg(
            F.sum(F.when(F.col("_rnk") <= k, term).otherwise(F.lit(0))).alias("_dcg"),
            F.sum(
                F.when(F.col("_irnk") <= k, ideal_term).otherwise(F.lit(0))
            ).alias("_idcg"),
        )
        .select(
            query_col,
            F.col("_dcg").cast("double").alias("dcg"),
            F.when(
                F.col("_idcg") > 0,
                F.round(
                    F.col("_dcg").cast("double") / F.col("_idcg").cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )
