"""Text-analysis operators for large-scale training-data pipelines.

Everything here is built-in-function Spark (split/regexp/aggregate) — no
Python UDFs — so the hot path stays inside whole-stage codegen and scales
linearly with input splits. Operators:

- token counting: whitespace tokens + a BPE-ish subword-regex count
- quality scoring: length / punctuation-ratio / stopword-ratio /
  mean-word-length signals combined into one score
- language ID: n-gram/stopword heuristic over a small per-language
  marker set (deterministic, dictionary-free)
- document fingerprint: polynomial rolling hash of normalized text
  (reproducible in ANSI SQL for oracle checks)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
]

# tiny deterministic per-language marker lists (n-gram heuristic):
# real deployments would plug a fasttext-style model in via pandas_udf.
LANG_MARKERS = {
    "en": ["the", "and", "is", "of"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "la", "que", "es"],
    "zh": ["de", "shi", "le", "zai"],
}


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    trimmed = F.trim(text_col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def word_grams(tok_col: Column, n: int, sep: str = " ") -> Column:
    """Array of word n-grams (joined by ``sep``) from a TOKEN-ARRAY
    column — linear in document length. Two per-doc quadratic traps
    this helper exists to avoid (measured: a 70k-token doc took >150 s
    through the naive expression, 1.3 s through this one):

    - ``tok_col`` must be a MATERIALIZED column (projected in a prior
      select), never a raw ``split(...)`` expression: higher-order
      function lambdas re-evaluate captured expressions per element, so
      an inline split re-tokenizes the whole document once per gram.
      Enforced here by accepting only a Column the caller already bound.
    - ``F.slice(arr, i, n)`` inside the lambda copies O(|arr|) per
      call in Spark's eval path; per-element ``element_at`` is O(1),
      so the gram build stays O(len · n).

    Docs shorter than n yield an empty array (sequence would descend)."""
    return F.when(
        F.size(tok_col) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(tok_col) - n),
            lambda i: F.concat_ws(
                sep, *[F.element_at(tok_col, i + k + 1) for k in range(n)]
            ),
        )
    )


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def subword_count(text_col: Column) -> Column:
    """BPE-ish proxy: count of letter-runs, digit-runs and punctuation
    marks — a stable upper-ish bound on BPE token count without a
    vocabulary. regexp_count is JVM-side."""
    return F.regexp_count(text_col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def punct_ratio(text_col: Column) -> Column:
    n_punct = F.regexp_count(text_col, F.lit(r"[^\w\s]"))
    return n_punct / F.greatest(F.length(text_col), F.lit(1))


def stopword_ratio(text_col: Column) -> Column:
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text_col: Column) -> Column:
    toks = tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with low
    punctuation noise, some stopwords (natural prose) and sane word
    lengths. Deterministic, expression-only."""
    length_ok = F.least(F.length(text_col) / F.lit(200.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text_col) * 5.0, F.lit(1.0))
    stop_ok = F.least(stopword_ratio(text_col) * 4.0, F.lit(1.0))
    mwl = mean_word_length(text_col)
    words_ok = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((length_ok + punct_ok + stop_ok + words_ok) / 4.0, 6)


def lang_id(text_col: Column) -> Column:
    """Heuristic language ID: pick the language whose marker words occur
    most often (ties → lexicographically first language code, 'und' when
    zero markers hit)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    scores = []
    for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items())):
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        # struct max compares (hits, -i): ties resolve to the FIRST lang
        scores.append(
            F.struct(hits.alias("hits"), F.lit(-i).alias("nidx"), F.lit(lang).alias("lang"))
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Polynomial rolling hash (mod 2^31-1, base 31) over the normalized
    text — a deterministic document fingerprint expressible in plain SQL:

        fold(chars c: h = (h*31 + ascii(c)) mod 2147483647)

    Expression-only via aggregate() over the char array."""
    normalized = F.lower(F.regexp_replace(text_col, r"\s+", " "))
    chars = F.split(normalized, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(2147483647),
    )


def repetition_signals(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models", Table A1 repetition filters), word-level:

    - ``dup_word_frac``: 1 − |distinct tokens| / |tokens| — pure array
      expressions, map-side only;
    - ``top_bigram`` / ``top_bigram_frac``: the most frequent word bigram
      and the fraction of tokens its occurrences cover (2·count/|tokens|,
      overlaps ignored). One explode + one groupBy(doc, bigram) with
      map-side partial aggregation + a per-doc row_number — the only
      shuffle, keyed on (doc_id, bigram), so repeated boilerplate
      aggregates before the exchange.

    Ties on the top bigram break lexicographically (count desc, bigram
    asc) so results are deterministic and SQL-oracle-matched. Docs with
    fewer than 2 tokens emit null bigram / 0.0 fraction."""
    from pyspark.sql import Window as W

    toks = F.transform(tokens(F.col(text)), lambda t: F.lower(t))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("w"),
        F.size(toks).alias("n_words"),
        F.round(
            1 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("dup_word_frac"),
    )
    bigrams = base.select(
        "doc_id",
        "n_words",
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    top = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("bg").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("bg").alias("top_bigram"), F.col("c").alias("top_bigram_count"))
    )
    return (
        base.join(top, "doc_id", "left")
        .withColumn(
            "top_bigram_frac",
            F.round(
                2.0 * F.coalesce(F.col("top_bigram_count"), F.lit(0))
                / F.greatest(F.col("n_words"), F.lit(1)),
                6,
            ),
        )
        .select(
            "doc_id", "n_words", "dup_word_frac",
            "top_bigram", F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            "top_bigram_frac",
        )
    )


def term_stats(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", k: int = 100
) -> DataFrame:
    """Corpus vocabulary statistics: top-k terms by collection frequency
    with document frequency and smoothed IDF.

    One explode → one groupBy(term) shuffle; `count_distinct(id)` inside
    the same aggregate keeps it a single pass. The corpus size joins in
    as a broadcast scalar (no driver-side collect), so the plan stays
    fully distributed at 100 TB: partial aggregation collapses the
    heavy-hitter terms map-side before the exchange, and the top-k is a
    TakeOrdered, not a global sort.

    idf = round(ln((N + 1) / (df + 1)), 6) — the standard smoothed form.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text))).alias("term")
    )
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("_id").alias("df"),
    )
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    return (
        stats.crossJoin(F.broadcast(n_docs))
        .withColumn("idf", F.round(F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6))
        .drop("n_docs")
        .orderBy(F.col("tf").desc(), "term")
        .limit(k)
    )


GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and"]


def gopher_rules(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher", Table A1)
    as one composite expression-only filter. Per document it emits each
    rule's boolean plus the AND of all of them (``passes``), so a curation
    pipeline can both filter and report per-rule rejection rates from a
    single scan.

    Rules (defaults are the published thresholds):
      - word count within [min_words, max_words]
      - mean word length within [min_mean_word_len, max_mean_word_len]
      - symbol-to-word ratio (``#`` or ``...``) <= max_symbol_ratio
      - fraction of lines starting with a bullet <= max_bullet_frac
      - fraction of lines ending with an ellipsis <= max_ellipsis_frac
      - fraction of words containing an alphabetic char >= min_alpha_word_frac
      - at least min_required_stopwords hits from the required-word list
        (the/be/to/of/and)

    Everything is array/regexp expressions over ONE scan — no shuffle, no
    UDF — so at 100 TB this is a map-only pass that AQE can pipeline into
    whatever consumes it. All ratios are emitted rounded to 6 dp so the
    DuckDB oracle hashes identically (integer-exact arithmetic only).
    """
    toks = F.transform(tokens(F.col(text)), lambda t: F.lower(t))
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1))
    mean_wl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / safe_words
    n_symbols = F.regexp_count(F.col(text), F.lit(r"#|\.\.\."))
    lines = F.split(F.col(text), r"\n")
    safe_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*([*\-•])")))
        / safe_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        / safe_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike(r"[a-zA-Z]"))) / safe_words
    )
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(GOPHER_REQUIRED_WORDS)))

    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": (n_symbols / safe_words) <= max_symbol_ratio,
        "ok_bullet": bullet_frac <= max_bullet_frac,
        "ok_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "ok_alpha_words": alpha_frac >= min_alpha_word_frac,
        "ok_stopwords": stop_hits >= min_required_stopwords,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(n_symbols / safe_words, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        *[c.alias(name) for name, c in flags.items()],
        passes.alias("passes"),
    )


def with_text_features(df: DataFrame, text: str = "text") -> DataFrame:
    col = F.col(text)
    return (
        df.withColumn("n_tokens", token_count(col))
        .withColumn("n_subwords", subword_count(col))
        .withColumn("punct_ratio", F.round(punct_ratio(col), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(col), 6))
        .withColumn("quality", quality_score(col))
        .withColumn("pred_lang", lang_id(col))
        .withColumn("fingerprint", fingerprint(col))
    )


# PII patterns kept RE2-compatible (no backrefs/lookbehind) so the same
# regex runs in Spark (java.util.regex) and the DuckDB oracle (RE2).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-category PII match counts (regexp_count is JVM-side)."""
    return {k: F.regexp_count(text_col, F.lit(p)) for k, p in PII_PATTERNS.items()}


def scrub_pii(text_col: Column) -> Column:
    """Redact PII in match-category order: each category's matches are
    replaced by its [CATEGORY] token. SSN runs before phone so the more
    specific pattern wins; the scan order is part of the contract."""
    out = text_col
    for key in ("email", "ssn", "phone", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[key], f"[{key.upper()}]")
    return out


def with_pii_scrubbed(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach per-category counts + the scrubbed text — the standard
    pre-training redaction pass; one projection, no shuffle."""
    col = F.col(text)
    out = df
    for key, cnt in pii_counts(col).items():
        out = out.withColumn(f"n_{key}", cnt)
    return out.withColumn("scrubbed", scrub_pii(col))


def token_commonness(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
) -> DataFrame:
    """Corpus-frequency quality signals per document — the CCNet-style
    "does this doc look like the corpus" proxy (Wenzek et al. 2020 score
    docs with an LM; the frequency formulation below is the vocabulary
    half of that signal, kept in INTEGER arithmetic so a SQL oracle can
    hash-verify it exactly — log-probability sums are float-order
    dependent across engines):

    - ``avg_token_count``: mean over the doc's tokens of each token's
      corpus-wide occurrence count (high = stock phrasing, low = rare
      vocabulary / noise),
    - ``rare_frac``: fraction of tokens whose corpus count is
      ≤ rare_max_count (OOV-ish mass — boilerplate ids, mangled text).

    Plan: one explode to (doc, token), token-count aggregate over the
    SAME exploded frame, then a token-keyed join back and one per-doc
    aggregate — two keyed shuffles plus a join AQE broadcasts when the
    vocabulary is small. Counts ride 8-byte integers; substituting
    log-probs for counts in the final projection turns this into the
    true LM score at scale (same plan, float output).

    Empty documents (no tokens after trim) are excluded — they have no
    token distribution to score; quality_score already flags them.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text)))).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("corpus_count"))
    return (
        toks.join(vocab, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("corpus_count"), 6).alias("avg_token_count"),
            F.round(
                F.sum(F.when(F.col("corpus_count") <= rare_max_count, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("rare_frac"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood — the CCNet-style
    "score every document with a language model" quality signal (Wenzek
    et al. 2020 use a wiki-trained KenLM; here the LM is the add-one-
    smoothed bigram model of the corpus ITSELF, so the operator needs no
    external artifact and still separates fluent from mangled text:
    boilerplate scores low NLL, shuffled/rare token soup scores high).

    Model: P(w2 | w1) = (C(w1 w2) + 1) / (C(w1) + V) with C from corpus
    occurrence counts and V the vocabulary size. Per document,
    nll = sum over bigram positions of -ln P, each term rounded to 6 dp
    and cast to DECIMAL(18,6) BEFORE the sum — decimal addition is exact
    integer arithmetic, so the per-doc total is identical no matter how
    partitions order the adds, and a DuckDB oracle hash-matches it (a
    raw double sum would be float-order dependent across engines; this
    is the same hardening key_skew's ratios use).

    Plan: one explode to (doc, w1, w2) pairs via a transform over index
    sequences (map-side), a bigram-keyed count and a unigram-keyed count
    (two shuffles with map-side partial aggregation — at 100 TB both key
    spaces are token-bounded, not doc-bounded), joins back (AQE
    broadcasts the counts when small), and one per-doc aggregate. The
    vocabulary size rides a broadcast cross join of a 1-row aggregate.
    Docs with < 2 tokens have no bigram and are excluded, matching the
    reference treatment of empty docs in token_commonness.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), tokens(F.lower(F.col(text))).alias("t"))
        .filter(F.size("t") >= 2)
    )
    pairs = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("id", "bg.w1", "bg.w2")

    uni = df.select(F.explode(tokens(F.lower(F.col(text)))).alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab_size = uni.select(F.countDistinct("w").alias("vs"))
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))

    nll = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            "id",
            F.round(
                -F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("vs"))), 6
            )
            .cast("decimal(18,6)")
            .alias("nll"),
        )
    )
    # avg = round-half-up(sum/n) computed ENTIRELY in integers
    # (micro-nll units): the decimal→double cast of sum_nll differs by an
    # ulp between engines, and a document whose true average sits exactly
    # on the 6-dp half boundary (sum_micros divisible into n at .5) then
    # rounds differently. (2s + n) div (2n) is the same integer everywhere.
    agg = nll.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("nll").alias("sum_nll"),
    )
    # sum_nll goes out as the DOUBLE nearest the exact decimal sum — both
    # engines cast the identical decimal, and float64 survives pandas
    # coercion where a Decimal object would not. __micros still derives
    # from the exact decimal (computed before the cast below).
    return agg.withColumn(
        "__micros", (F.col("sum_nll") * 1_000_000).cast("long")
    ).withColumn(
        "avg_nll",
        F.expr("(2 * __micros + n_bigrams) div (2 * n_bigrams)").cast("double")
        / 1_000_000.0,
    ).withColumn("sum_nll", F.col("sum_nll").cast("double")).drop("__micros")


def _poly_hash(tok: Column, base: int) -> Column:
    """Per-token polynomial rolling hash mod 2^31-1 — the same portable
    construction as fingerprint(), so any SQL engine replays it exactly
    (no xxhash64 dependence). Different bases give the independent hash
    functions the sketch/hashing-trick family needs."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % F.lit(2147483647),
    )


def hashed_features(
    df: DataFrame,
    dim: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature hashing ("the hashing trick", Weinberger et al. 2009):
    each document becomes a dim-wide integer vector, f[j] = sum over
    tokens with bucket(token) == j of sign(token), bucket from one
    rolling hash (base 31) and the ±1 sign from an independent one
    (base 37) — the sign makes bucket collisions cancel in expectation,
    which is what lets a tiny dim still separate documents.

    This is the classical text→vector bridge in front of the embedding
    operators (ANN / dedup / clustering) when no learned model is
    available: map-side only (one transform computes both hashes per
    token, then dim integer folds), no shuffle, no UDF, integer-exact
    output — so the SQL oracle matches bit-for-bit. Empty documents are
    excluded (no token mass), matching token_commonness.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), tokens(F.lower(F.col(text))).alias("t"))
        .filter(F.size("t") >= 1)
    )
    hashed = toks.select(
        "id",
        F.transform(
            F.col("t"),
            lambda tok: F.struct(
                (_poly_hash(tok, 31) % dim).alias("b"),
                (1 - 2 * (_poly_hash(tok, 37) % 2)).alias("s"),
            ),
        ).alias("h"),
    )
    def _feat(j: int) -> Column:
        return F.aggregate(
            F.col("h"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x["b"] == j, x["s"]).otherwise(0),
        ).alias(f"f{j}")

    return hashed.select("id", *[_feat(j) for j in range(dim)])


CMS_BASES = (31, 37, 41, 43)


def count_min_table(
    df: DataFrame | None = None,
    width: int = 64,
    depth: int = 4,
    text: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built AS a
    DataFrame: (d, bucket, cnt) with bucket = hash_d(token) % width, one
    independent rolling-hash base per row d. The sketch is depth·width
    rows regardless of corpus size — the right shape for a distributed
    build: one explode (each token emits its depth buckets from the same
    pass) and ONE keyed aggregate with map-side combine; no driver-side
    sketch object, and the result is joinable, persistable parquet.

    ``toks``: optional pre-tokenized (tok) table — callers that also
    need exact counts or totals over the SAME token stream pass the
    shared (checkpointed) table instead of having the sketch re-run the
    tokenize pass (r9-opt: count_min_bound ran the corpus tokenize
    once per consumer, each pinned to the single parquet split).
    """
    bases = CMS_BASES[:depth]
    if toks is None:
        toks = df.select(F.explode(tokens(F.lower(F.col(text)))).alias("tok"))
    emitted = toks.select(
        F.posexplode(
            F.array(*[(_poly_hash(F.col("tok"), b) % width) for b in bases])
        ).alias("d", "bucket")
    )
    return emitted.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimates(
    sketch: DataFrame,
    queries: DataFrame,
    width: int = 64,
    tok_col: str = "tok",
) -> DataFrame:
    """Point-query the sketch table for each token in ``queries``:
    estimate = min over rows d of the counter at (d, hash_d(token)).
    The query side is small by construction (heavy-hitter candidates),
    so both the bucket join and the per-token min are broadcast-sized.

    LEFT join + coalesce(0): the sketch table is sparse (only touched
    buckets have rows), so a probe landing in an untouched bucket means
    counter == 0 — it must participate in the min (an absent token's
    estimate is 0), not silently drop out of it. An inner join here
    breaks the CMS upper-bound guarantee for rare/absent tokens.
    """
    bases = CMS_BASES
    probes = queries.select(
        tok_col,
        F.posexplode(
            F.array(*[(_poly_hash(F.col(tok_col), b) % width) for b in bases])
        ).alias("d", "bucket"),
    )
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(tok_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def ngram_diversity(
    df: DataFrame,
    n: int = 2,
    text: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Distinct-n diversity per stratum (Li et al. 2016's distinct-n,
    the standard corpus-diversity signal): distinct n-grams / total
    n-gram occurrences. Low diversity flags templated/boilerplate-heavy
    sources before they flood a training mix; the same ratio per
    TEMPERATURE-re-weighted mixture is the post-hoc check that
    upsampling didn't collapse variety.

    Skew-safe two-stage distinct (the exact_distinct_two_stage shape):
    one (stratum, gram)-keyed aggregate collapses duplicate grams
    map-side, then a |distinct grams|-row rollup derives both the
    distinct count (rows) and the total (sum of counts) — no Expand, no
    per-stratum value-set funneling, and the gram strings shuffle once.
    """
    toks = df.select(
        F.col(strata_col).alias("s"), tokens(F.lower(F.col(text))).alias("t")
    ).filter(F.size("t") >= n)
    grams = toks.select(
        "s", F.explode(word_grams(F.col("t"), n)).alias("g")
    )
    per_gram = grams.groupBy("s", "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("s")
        .agg(
            F.sum("c").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
        )
        .select(
            F.col("s").alias(strata_col),
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams") / F.col("total_ngrams").cast("double"), 6
            ).alias("diversity"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 5, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-domain top-k TF-IDF terms — the corpus-characterization
    report (what vocabulary distinguishes each source from the rest).
    TF = term occurrences within the domain; IDF = ln(n_domains / df)
    over DOMAIN-level document frequency. One tokenize + two keyed
    aggregates riding the same (term) key, a broadcast of the tiny
    per-term IDF table, and a per-domain top-k window over |domain
    vocabulary| rows.

    Scores stay exact: integer TF x DECIMAL(20,9)-quantized IDF, so
    the (score desc, term) ranking ties identically in any engine;
    the emitted score is the nearest DOUBLE of that exact decimal."""
    toks = df.select(
        group_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # n_domains rides the plan as a broadcast scalar — no driver action
    n_groups = df.select(group_col).distinct().agg(
        F.count(F.lit(1)).alias("_ng")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_groups))
        .select(
            "term",
            F.round(F.log(F.col("_ng").cast("double") / F.col("df")), 9)
            .cast("decimal(20,9)")
            .alias("idf"),
        )
    )
    from pyspark.sql.window import Window

    scored = tf.join(F.broadcast(idf), "term").select(
        group_col,
        "term",
        "tf",
        # tf cast to DECIMAL(10,0) first: a LONG operand is decimal(20,0)
        # and (20,0)x(20,9) overflows precision 38, making Spark silently
        # REDUCE the scale to 6 (allowPrecisionLoss) — the oracle keeps
        # scale 9 and the hash diverges in the 7th decimal
        (F.col("tf").cast("decimal(10,0)") * F.col("idf")).alias("_score"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("_score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            group_col,
            "rank",
            "term",
            "tf",
            F.col("_score").cast("double").alias("tfidf"),
        )
        .orderBy(group_col, "rank")
    )


def bpe_merge_candidates(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """One counting round of BPE tokenizer training (Sennrich et al.
    2016): the frequency of every adjacent symbol pair across the
    corpus, weighted by word frequency — the statistic whose argmax
    becomes the next merge rule. The reference engines ship nothing
    like a tokenizer trainer; a training-data pipeline needs one, and
    the count step is the part that must run at corpus scale (the merge
    loop itself is a driver-side iteration over a vocab-sized table).

    Plan shape for 100 TB: the corpus collapses to the DISTINCT-WORD
    table first (one token-keyed aggregate with map-side combine — the
    key space is vocabulary-bounded, not corpus-bounded), and pair
    explosion happens on that vocab table, so the quadratic-ish char
    fanout multiplies |vocab| x word-length, never corpus size. One
    further pair-keyed aggregate (alphabet² keys) and a top-k window
    over that tiny table. All-integer output; (count desc, a, b)
    tie-break makes the k-boundary engine-independent."""
    words = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
    wc = (
        words.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    F.col("w").substr(i, F.lit(1)).alias("a"),
                    F.col("w").substr(i + 1, F.lit(1)).alias("b"),
                ),
            )
        ).alias("p"),
        "c",
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "c")
    agg = pairs.groupBy("a", "b").agg(F.sum("c").alias("pair_count"))
    from pyspark.sql.window import Window

    # distributed TakeOrdered prune before the single-partition ranking
    # window — the window only ever sees k rows (pair space is
    # alphabet², small today, but a CJK corpus makes it millions).
    top = agg.orderBy(F.col("pair_count").desc(), "a", "b").limit(k)
    w = Window.orderBy(F.col("pair_count").desc(), "a", "b")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "a", "b", "pair_count")
        .orderBy("rank")
    )


def char_entropy_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon character entropy (nats) — the classic
    gibberish/boilerplate separator: encrypted or base64 blobs score
    near ln(alphabet), repeated-character spam scores near 0; natural
    text sits in a narrow band. Used as a cheap pre-filter before
    model-based quality scoring.

    Plan: one map-side explode of text into characters, a (doc, char)
    keyed count (the shuffle carries |docs| x |alphabet| rows, with
    map-side combine collapsing repeats before the wire), and one
    per-doc aggregate. Each -p·ln(p) term is rounded to 6 dp and summed
    as DECIMAL(18,6), so the per-doc total is add-order-independent and
    a DuckDB oracle hash-matches it bit-for-bit (the bigram_lm_scores
    hardening); the emitted entropy is the nearest DOUBLE of that exact
    decimal."""
    chars = df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("id", "n", "ch").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        counts.groupBy("id", "n")
        .agg(F.sum(term).alias("ent"))
        .select(
            F.col("id").alias(id_col),
            F.col("n").alias("n_chars"),
            F.col("ent").cast("double").alias("entropy_nats"),
        )
    )


def tokenizer_fertility(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Tokenizer fertility report per source: characters per whitespace
    token, characters per BPE-ish subword, and subwords per word — the
    standard "how many pieces does the tokenizer cut a word into"
    diagnostic that decides which sources inflate training cost (high
    fertility = morphology/noise the vocab doesn't cover). One
    expression-only scan + one grouped sum; ratios are IEEE quotients
    of exact integer sums."""
    per_doc = df.select(
        group_col,
        F.length(text_col).alias("chars"),
        token_count(F.col(text_col)).alias("words"),
        subword_count(F.col(text_col)).alias("subwords"),
    )
    g = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chars").alias("chars"),
        F.sum("words").alias("words"),
        F.sum("subwords").alias("subwords"),
    )
    return g.select(
        group_col,
        "n_docs",
        "chars",
        "words",
        "subwords",
        F.round(F.col("chars").cast("double") / F.col("words"), 6).alias(
            "chars_per_word"
        ),
        F.round(F.col("chars").cast("double") / F.col("subwords"), 6).alias(
            "chars_per_subword"
        ),
        F.round(F.col("subwords").cast("double") / F.col("words"), 6).alias(
            "fertility"
        ),
    ).orderBy(group_col)


def doc_length_histogram(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Power-of-two token-length histogram per source — the curation
    view that exposes truncation risk (mass above the context window)
    and fragment pollution (mass in the 0-8 bucket). Bucket =
    floor(log2(tokens)) via integer bit-length arithmetic, so bucket
    boundaries are exact on any engine; one scan, one small keyed
    aggregate."""
    n = token_count(F.col(text_col))
    # floor(log2(n)) computed integrally: length of the binary string
    # minus 1 — no float log at the bucket boundary
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.length(F.conv(n.cast("string"), 10, 2)) - 1
    )
    return (
        df.select(F.col(group_col), bucket.alias("log2_bucket"))
        .groupBy(group_col, "log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(group_col, "log2_bucket")
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of this doc's token
    n-gram POSITIONS whose gram has never appeared in any lower-id
    document — the marginal-information view of a crawl ("how much of
    shard k is new text?") that drives diminishing-returns curves for
    data collection. A position counts as novel iff the corpus-wide
    first occurrence (min doc id over the gram) is this document.

    Plan at 100 TB: grams are built map-side from the token array
    (transform over slices — no UDF); each gram's corpus-wide first doc
    is a min() window over the gram-partitioned exchange — the SAME
    single shuffle a (gram → min id) aggregate would need, but without
    the self-join that would re-build and re-exchange the gram table a
    second time (the ngram_jaccard df-window trick; measured 4x
    end-to-end). Hot grams make one window partition hot — salt or cap
    with max_df upstream if a boilerplate gram dominates (the
    max_shingle_df playbook)."""
    from pyspark.sql.window import Window

    pos = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    ).select("id", F.explode(word_grams(F.col("_toks"), n)).alias("gram"))
    scored = (
        pos.withColumn("first_id", F.min("id").over(Window.partitionBy("gram")))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("first_id") == F.col("id"), 1).otherwise(0)).alias(
                "novel_grams"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("novel_grams", F.lit(0)).alias("novel_grams"),
            F.round(
                F.coalesce(
                    F.col("novel_grams") / F.col("n_grams"), F.lit(0.0)
                ),
                6,
            ).alias("novelty"),
        )
    )


def token_burstiness(
    df: DataFrame, k: int = 30, text_col: str = "text"
) -> DataFrame:
    """Church–Gale burstiness per token: mean occurrences per CONTAINING
    document (total_count / doc_freq), top-k. A token with burstiness
    near 1 sprinkles evenly; a high-burstiness token clumps — it
    dominates the documents it appears in, which inflates n-gram dedup
    candidate sets and skews TF-IDF, so curation wants the list before
    choosing thresholds. One explode + one (token) aggregate over
    per-doc combined counts, then a k-row distributed TakeOrdered —
    burstiness is DECIMAL-quantized so ties and hashes are exact."""
    toks = df.select(
        F.col("doc_id").alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    per_doc = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    stats = per_doc.groupBy("tok").agg(
        F.sum("c").alias("total_count"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    burst = (
        (F.col("total_count").cast("double") / F.col("doc_freq"))
        .cast("decimal(18,6)")
        .cast("double")
    )
    return (
        stats.select("tok", "total_count", "doc_freq", burst.alias("burstiness"))
        .orderBy(F.col("burstiness").desc(), "tok")
        .limit(k)
    )


def rouge1_adjacent_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """ROUGE-1 set overlap between each even document and its successor
    (doc i ↔ doc i+1): precision = |A∩B|/|A|, recall = |A∩B|/|B|, F1 —
    the eval-leakage metric reported over a deterministic pairing so
    the whole sweep is one equi-join, not an all-pairs scan (pair
    generation at scale comes from a candidate stage like LSH; this
    fixed pairing exercises and verifies the scoring kernel).

    Plan: ONE aggregation chain, no join at all — each distinct (doc,
    token) row maps to its pair key (id − id%2) carrying which SIDE it
    came from; a (pair, token) aggregate merges the two sides'
    presence flags, and a pair-level rollup counts |A|, |B|, |A∩B|
    from the flags. Three keyed exchanges total, each over distinct
    token rows, versus the naive sets-sizes-overlap formulation whose
    four references to the token table re-built it four times
    (22 exchanges; measured 2x end-to-end)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).distinct()
    flagged = toks.select(
        (F.col("id") - F.col("id") % 2).alias("pair"),
        "tok",
        (F.col("id") % 2 == 0).alias("is_a"),
    )
    per_tok = flagged.groupBy("pair", "tok").agg(
        F.max(F.when(F.col("is_a"), 1).otherwise(0)).alias("in_a"),
        F.max(F.when(~F.col("is_a"), 1).otherwise(0)).alias("in_b"),
    )
    out = (
        per_tok.groupBy("pair")
        .agg(
            F.sum("in_a").alias("n_a"),
            F.sum("in_b").alias("n_b"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("overlap"),
        )
        # a pair needs both documents non-empty (matches the join form)
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            F.col("pair").alias("id_a"),
            (F.col("pair") + 1).alias("id_b"),
            "n_a",
            "n_b",
            "overlap",
        )
    )
    dec = lambda c: F.round(c, 6)  # noqa: E731
    p = F.col("overlap") / F.col("n_a")
    r = F.col("overlap") / F.col("n_b")
    return out.select(
        "id_a", "id_b", "n_a", "n_b", "overlap",
        dec(p).alias("p"),
        dec(r).alias("r"),
        F.when(F.col("overlap") == 0, F.lit(0.0))
        .otherwise(dec(2 * p * r / (p + r)))
        .alias("f1"),
    )


def vocabulary_growth(
    df: DataFrame,
    buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: docs ordered by id split into
    ``buckets`` equal-width id ranges; per checkpoint, cumulative token
    positions and cumulative DISTINCT vocabulary — the curve whose
    flattening says "more of the same crawl adds no new language" and
    sizes tokenizer vocab budgets.

    Plan: vocabulary is counted by FIRST OCCURRENCE (one (token) min
    aggregate), so the cumulative distinct needs no per-checkpoint
    distinct pass — bucket the first-occurrence ids, count, and prefix-
    sum over ``buckets`` rows (a window over a provably tiny table)."""
    from pyspark.sql.window import Window

    # bucket by the id RANGE, not the row count: after an upstream
    # filter/dedup the ids are sparse, and count-based widths would emit
    # far more (or fewer) than `buckets` checkpoints. One cheap min/max
    # pre-pass bounds the width. (For dense 0..n-1 ids this is identical
    # to the count-based form.)
    bounds = df.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    if bounds["lo"] is None:
        return df.sparkSession.createDataFrame(
            [], "bucket int, docs_so_far long, tokens_so_far long, vocab_size long"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max((hi - lo + 1 + buckets - 1) // buckets, 1)
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tok_b = toks.select(((F.col("id") - lo) / width).cast("int").alias("b"))
    per_bucket_tokens = tok_b.groupBy("b").agg(F.count(F.lit(1)).alias("toks"))
    first = toks.groupBy("tok").agg(F.min("id").alias("first_id"))
    per_bucket_vocab = first.select(
        ((F.col("first_id") - lo) / width).cast("int").alias("b")
    ).groupBy("b").agg(F.count(F.lit(1)).alias("new_vocab"))
    per_bucket_docs = df.select(
        ((F.col(id_col) - lo) / width).cast("int").alias("b")
    ).groupBy("b").agg(F.count(F.lit(1)).alias("docs"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket_docs.join(per_bucket_tokens, "b", "left")
        .join(per_bucket_vocab, "b", "left")
        .select(
            F.col("b").alias("bucket"),
            F.sum("docs").over(w).alias("docs_so_far"),
            F.sum(F.coalesce("toks", F.lit(0))).over(w).alias("tokens_so_far"),
            F.sum(F.coalesce("new_vocab", F.lit(0))).over(w).alias("vocab_size"),
        )
        .orderBy("bucket")
    )


def span_corruption_stats(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    block: int = 20,
    span: int = 3,
) -> DataFrame:
    """T5-style span-corruption accounting, deterministic: token
    positions p with p mod ``block`` < ``span`` are masked (corruption
    rate span/block = 15% at the defaults, mean span length = ``span``
    — the T5 recipe's numbers without its RNG). Per document:

      n_spans     = full blocks + one partial span when a block remnant
                    exists (closed form from n_tokens alone)
      n_masked    = full·span + min(remnant, span)
      inputs_len  = n_tokens − n_masked + n_spans   (one sentinel/span)
      targets_len = n_masked + n_spans + 1          (sentinels + EOS)

    Everything is integer arithmetic ON THE TOKEN COUNT — no per-token
    explode, so the scan cost is the same as text_tokens regardless of
    document length. The seq-len planning downstreams (pack_sequences,
    padding_efficiency) consume inputs_len/targets_len directly."""
    n = token_count(F.col(text))
    full = F.floor(n / block).cast("long")
    rem = (n % block).cast("long")
    n_spans = full + F.when(rem > 0, 1).otherwise(0)
    n_masked = full * span + F.least(rem, F.lit(span).cast("long"))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_spans.alias("n_spans"),
        n_masked.alias("n_masked"),
        (n - n_masked + n_spans).cast("long").alias("inputs_len"),
        F.when(n > 0, n_masked + n_spans + 1).otherwise(F.lit(0)).cast("long").alias(
            "targets_len"
        ),
    )


def phrase_occurrences(
    df: DataFrame,
    phrase: str,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact multi-token phrase search — contamination forensics' grep:
    per document containing the phrase (whitespace-normalized,
    case-folded), the number of non-overlapping occurrences and the
    first match's token offset. Distinct from substring FILTERS: this
    reports counts/positions for quantifying how deeply a benchmark
    string leaked, not just membership.

    One scan, all codegen expressions (regexp_count / instr / a prefix
    token count for the offset); the contains() pre-filter keeps the
    regex off non-matching documents. At corpus scale the right
    companion is a shingle-index candidate step (contamination's plan) —
    this operator is the verify/report leg."""
    norm_phrase = " ".join(phrase.lower().split())
    if "'" in norm_phrase or "\\" in norm_phrase:
        # the offset expression embeds the phrase as a SQL string literal
        raise ValueError("phrase must not contain quotes or backslashes")
    norm = F.lower(F.trim(F.regexp_replace(F.col(text), r"\s+", " ")))
    import re as _re

    pat = _re.escape(norm_phrase)
    hit = norm.contains(norm_phrase)
    prefix = F.expr(
        f"substring(lower(trim(regexp_replace({text}, '\\\\s+', ' '))), 1, "
        f"instr(lower(trim(regexp_replace({text}, '\\\\s+', ' '))), "
        f"'{norm_phrase}') - 1)"
    )
    return (
        df.filter(hit)
        .select(
            F.col(id_col),
            F.regexp_count(norm, F.lit(pat)).alias("n_occurrences"),
            # token offset = tokens fully before the first hit
            F.size(tokens(prefix)).alias("first_token_offset"),
        )
    )


def good_turing(docs: DataFrame, text_col: str = "text", max_r: int = 5) -> DataFrame:
    """Good–Turing frequency-of-frequencies estimate (Good 1953) over
    the corpus vocabulary — the classic answer to "how much probability
    mass belongs to words we have NOT seen yet?", which prices how far
    vocabulary collection has converged (the companion readout to the
    Heaps'-law curve in vocabulary_growth).

    Per frequency r ≤ max_r: the type count N_r, the adjusted count
    r* = (r+1)·N_{r+1}/N_r, the maximum-likelihood mass r·N_r/N and the
    Good–Turing mass (r+1)·N_{r+1}/N. The r=0 row is the headline: its
    gt_mass = N_1/N is the estimated probability that the NEXT token is
    a brand-new type.

    Plan: one token explode + (token) count — the same single shuffle
    any vocabulary statistic pays — then the frequency histogram and a
    literal (max_r+1)-row grid join, all bounded."""
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    fof = tc.groupBy("r").agg(F.count(F.lit(1)).alias("n_types"))
    # N_r table is bounded by the max token frequency; it feeds the
    # totals AND two grid joins — checkpoint keeps the corpus shuffle
    # at one execution
    fof = fof.localCheckpoint(eager=False)
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_types")).alias("n_tokens")
    )
    grid = docs.sparkSession.range(0, max_r + 1).select(F.col("id").alias("r"))
    cur = fof.withColumnRenamed("n_types", "_cur")
    nxt = fof.select((F.col("r") - 1).alias("r"), F.col("n_types").alias("_nxt"))
    g = (
        grid.join(cur, "r", "left")
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            F.coalesce("_cur", F.lit(0)).alias("n_types"),
            F.coalesce("_nxt", F.lit(0)).alias("next_types"),
            "n_tokens",
        )
    )
    r_star = F.when(
        F.col("n_types") > 0,
        F.round(
            (F.col("r") + 1).cast("double")
            * F.col("next_types")
            / F.col("n_types"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return g.select(
        "r",
        "n_types",
        "next_types",
        r_star.alias("r_star"),
        F.round(
            F.col("r").cast("double") * F.col("n_types") / F.col("n_tokens"), 6
        ).alias("ml_mass"),
        F.round(
            (F.col("r") + 1).cast("double")
            * F.col("next_types")
            / F.col("n_tokens"),
            6,
        ).alias("gt_mass"),
    )


_CODE_KEYWORDS = (
    "def", "return", "import", "class", "function", "const", "var",
    "let", "void", "int", "public", "static", "elif", "lambda",
    "struct", "enum", "typedef", "fn", "impl", "println",
)


def code_score(text_col: Column, tok_col: Column) -> Column:
    """Composite [0,1] code-likeness score — the code-vs-prose filter a
    pretraining pipeline runs before routing documents to the code or
    natural-language mixture (the StarCoder/CodeParrot-style cleanup
    pass), expression-only so it stays in whole-stage codegen:

      - symbol density: {}();=[]<> chars per char (prose ≈ 0)
      - keyword share: tokens in a 20-word cross-language keyword list
      - identifier share: snake_case / camelCase token patterns

    score = 0.4·min(1, 8·sym) + 0.4·min(1, 5·kw) + 0.2·min(1, 5·ident),
    rounded to 6. ``tok_col`` must be a MATERIALIZED token column (the
    word_grams HOF contract)."""
    sym = (
        F.length(text_col)
        - F.length(F.regexp_replace(text_col, r"[{}();=\[\]<>]", ""))
    ) / F.greatest(F.length(text_col), F.lit(1))
    ntok = F.greatest(F.size(tok_col), F.lit(1))
    kw_arr = F.array(*[F.lit(k) for k in _CODE_KEYWORDS])
    kw = F.size(
        F.filter(tok_col, lambda t: F.array_contains(kw_arr, F.lower(t)))
    ) / ntok
    ident = F.size(
        F.filter(
            tok_col,
            lambda t: t.rlike(r"^[a-z]+(_[a-z0-9]+)+$")
            | t.rlike(r"^[a-z]+([A-Z][a-z0-9]+)+$"),
        )
    ) / ntok
    return F.round(
        F.least(sym * 8.0, F.lit(1.0)) * 0.4
        + F.least(kw * 5.0, F.lit(1.0)) * 0.4
        + F.least(ident * 5.0, F.lit(1.0)) * 0.2,
        6,
    )


def code_detection_report(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Per-source code-contamination report over code_score: document
    counts, the share crossing ``threshold``, and the DECIMAL-exact
    mean score — the routing readout before a corpus mixes into an NL
    training set. One scan, one grouped aggregate."""
    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        "source", F.col(text_col).alias("_txt"), tokens(F.col(text_col)).alias("_toks")
    )
    scored = base.select(
        "source", code_score(F.col("_txt"), F.col("_toks")).alias("s")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("s") >= threshold).cast("long")).alias("n_code"),
        F.round(
            F.sum((F.col("s") >= threshold).cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("code_share"),
        F.round(
            F.sum(F.col("s").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_score"),
    )


def pii_density_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source PII density — matches per 1 000 characters for each
    category — the triage view over scrub_pii's per-doc counts: which
    SOURCE is leaking emails/phones/SSNs/IPs, and at what rate, so a
    curation run can quarantine a feed instead of scrubbing blind. One
    projection + one grouped DECIMAL-free integer rollup (counts and
    chars are exact longs; only the final per-1k ratios are doubles)."""
    col = F.col(text_col)
    counts = pii_counts(col)
    base = docs.select(
        "source",
        F.length(col).alias("_chars"),
        *[cnt.alias(f"_n_{k}") for k, cnt in counts.items()],
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_chars").alias("n_chars"),
    ]
    for k in counts:
        aggs.append(F.sum(f"_n_{k}").alias(f"n_{k}"))
    out = base.groupBy("source").agg(*aggs)
    for k in counts:
        out = out.withColumn(
            f"{k}_per_1k",
            F.round(
                F.col(f"n_{k}") * 1000.0 / F.col("n_chars"), 6
            ),
        )
    return out
