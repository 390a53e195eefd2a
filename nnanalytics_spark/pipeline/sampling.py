"""Deterministic sampling / splitting / sharding for training-data curation.

Every operator keys on a multiplicative hash of the id column —
``(id * 2654435761) % 1000`` (Knuth's 2^32/phi constant) — instead of
rand(): the decision for a row never changes across runs, retries, or
cluster sizes, which is what a reproducible corpus build needs, and the
whole predicate is a codegen'd integer expression reproducible in ANSI SQL
(so DuckDB oracles can replay it bit-for-bit).

Scale shape: sampling and splitting are pure map-side filters (no shuffle,
pushed to the scan when the id is a stored column); shard assignment adds
one projection and lets the writer's partitionBy("shard") do the single
shuffle a sharded corpus write needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # floor(2^32 / golden ratio)


def _bucket(id_col: Column, modulus: int = 1000) -> Column:
    """Non-negative bucket in [0, modulus) == pmod(id * KNUTH, modulus).

    Computed as pmod(pmod(id, m) * (KNUTH % m), m) — modular arithmetic
    makes this identical to hashing the full product, but both factors stay
    below the modulus so the multiply can never overflow int64 (a bare
    ``id * KNUTH`` throws ARITHMETIC_OVERFLOW under ANSI mode once
    |id| >= 2^63/KNUTH ≈ 3.47e9, i.e. for half of all xxhash64-derived
    ids), and pmod keeps negative ids inside the contract range where
    Spark's sign-preserving ``%`` would leak negative buckets."""
    m = F.lit(modulus)
    return F.pmod(F.pmod(id_col.cast("long"), m) * F.lit(KNUTH % modulus), m)


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 1000,
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Keep ~rate/1000 of each stratum, chosen deterministically by id.

    The per-stratum rate rides a constant-folded literal map; the filter is
    one integer comparison per row — sampleBy() semantics without rand()'s
    run-to-run drift."""
    rate_map = F.create_map(*[F.lit(x) for kv in rates_permille.items() for x in kv])
    rate = F.coalesce(
        F.element_at(rate_map, F.col(strata_col)), F.lit(default_permille)
    )
    return df.filter(_bucket(F.col(id_col)) < rate)


def train_test_split(
    df: DataFrame, test_permille: int = 100, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a deterministic 'split' column ('test' for ~test_permille/1000
    of rows, else 'train'). Stable under reruns and data reordering."""
    return df.withColumn(
        "split",
        F.when(_bucket(F.col(id_col)) < test_permille, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def shard_assign(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic 'shard' in [0, n_shards): the write-side
    partition key for a sharded corpus (df.write.partitionBy('shard'))."""
    return df.withColumn("shard", (_bucket(F.col(id_col), n_shards)).cast("int"))


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Sequence packing for training: concatenate documents in id order
    (per shard) and chunk the token stream every `budget` tokens; each
    doc is assigned to the pack where its FIRST token lands, with its
    start offset inside the stream.

    These are "offset packing" semantics — a pure prefix-sum, so the
    whole assignment is ONE window aggregation (running token total),
    no iteration and no driver loop. Per shard the window sort is the
    only cost; sharding first (shard_assign) bounds each window's
    partition, which is what keeps the sort in-memory at 100 TB.
    First-fit-decreasing packs ~token_count/budget tighter but needs
    sequential state; the streaming-concat semantics here are the ones
    large training pipelines actually use (docs are separator-joined
    into a flat token stream, then split into fixed windows).
    """
    from nnanalytics_spark.pipeline.text import token_count

    from pyspark.sql import Window as W

    if shard_col is None:
        # A global stream would be a single-reducer window sort — the one
        # plan shape this module promises never to produce. Auto-shard by
        # id so the window stays bounded; callers who shard explicitly
        # (shard_assign) keep full control of stream boundaries.
        df = shard_assign(df, n_shards=256, id_col=id_col)
        shard_col = "shard"
    w = (
        W.partitionBy(F.col(shard_col))
        .orderBy(F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    n_tok = token_count(F.col(text))
    start = F.coalesce(F.sum(n_tok).over(w), F.lit(0).cast("long"))
    out = df.withColumn("n_tokens", n_tok.cast("long")).withColumn(
        "start_offset", start.cast("long")
    )
    return out.withColumn(
        "pack_id", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
    )


def mixture_upsample(
    df: DataFrame,
    epochs_permille: dict[str, int],
    default_permille: int = 1000,
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Training-mixture upsampling: repeat each stratum ~epochs times,
    where epochs is expressed in permille (2250 = 2.25 epochs). The
    integer part becomes full copies; the fractional part is one extra
    copy for a deterministic id-hash-chosen subset — so every source hits
    its target mixture weight exactly in expectation and reproducibly
    per row (no rand(); the same rows get the extra epoch every run).

    Output carries a ``copy`` index (0-based) so downstream shuffles/
    packing can distinguish repeats. Map-side only: the explode happens
    at the scan projection, no shuffle; at 100 TB the writer's shard
    partitioning is unchanged because copies inherit the row's id.

    This is the repeat-weighted half of mixture building (upsampling
    wiki/books-style sources above 1.0 epochs); stratified_sample is the
    downsampling half (rates < 1.0 drop rows instead of repeating)."""
    e_map = F.create_map(*[F.lit(x) for kv in epochs_permille.items() for x in kv])
    permille = F.coalesce(
        F.element_at(e_map, F.col(strata_col)), F.lit(default_permille)
    ).cast("long")
    n_copies = (permille / 1000).cast("long") + F.when(
        _bucket(F.col(id_col)) < permille % 1000, F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(0, -1) would generate a DESCENDING range; guard empties
    copies = F.when(n_copies > 0, F.sequence(F.lit(0), (n_copies - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy", F.explode(copies))


def temperature_mixture(
    df: DataFrame,
    temperature: float = 3.333333,
    size_col: str = "n_chars",
    strata_col: str = "source",
    token_budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled mixture planner (the UniMax / mT5 sampling
    rule, Chung et al. 2023 / Xue et al. 2021): source sampling rate
    r_i ∝ c_i^(1/T) where c_i is the source's size. T=1 reproduces
    natural proportions; T→∞ approaches uniform — the standard knob for
    keeping low-resource sources from vanishing in a multilingual /
    multi-source mix.

    Emits per source: size, natural share, temperature-scaled rate, and
    — when ``token_budget`` is given — the implied epochs over that
    source (budget * rate / size), the number ``mixture_upsample``
    consumes as its permille map. The heavy input is one grouped sum
    over the corpus (map-side combine); the normalization is a
    broadcast-scalar join over |sources| rows, so the plan is
    corpus-one-pass at any scale."""
    sizes = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(size_col).alias("size")
    )
    powed = sizes.withColumn("p", F.pow(F.col("size"), 1.0 / temperature))
    totals = powed.agg(
        F.sum("size").alias("tot_size"), F.sum("p").alias("tot_p")
    )
    out = powed.crossJoin(F.broadcast(totals)).select(
        strata_col,
        "n_docs",
        "size",
        F.round(F.col("size") / F.col("tot_size"), 6).alias("natural_share"),
        F.round(F.col("p") / F.col("tot_p"), 6).alias("rate"),
    )
    if token_budget is not None:
        out = out.withColumn(
            "epochs",
            F.round(F.lit(token_budget) * (F.col("rate") / F.col("size")), 6),
        )
    return out.orderBy(strata_col)


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 32,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document's token sequence into
    ceil(n/max_tokens) consecutive fixed-size chunks — the
    document-preserving alternative to pack_sequences (no cross-doc
    concatenation, so no attention bleed across document boundaries;
    the trade is a padded final chunk per doc instead of per pack).

    Map-side only: tokens → slice per chunk index → posexplode. No
    shuffle, no UDF; output rows ≈ corpus_tokens / max_tokens regardless
    of document length skew, so one pathological 10 GB document becomes
    many rows instead of one giant array cell. The token array is
    MATERIALIZED before the chunk lambda (word_grams contract: a
    captured split expression re-tokenizes the whole doc once per
    chunk); slice per CHUNK is fine — O(len²/max_tokens) per doc stays
    ~len·(chunks) with the big constant gone, unlike per-GRAM slicing.
    """
    from nnanalytics_spark.pipeline.text import tokens

    toked = df.select(F.col(id_col), tokens(F.col(text)).alias("_toks"))
    toks = F.col("_toks")
    n_chunks = F.greatest(
        F.lit(1), F.ceil(F.size(toks) / F.lit(max_tokens)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * max_tokens + 1, max_tokens),
    )
    return toked.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    ).select(
        F.col(id_col),
        "chunk_idx",
        F.size("chunk").alias("n_chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


def cluster_split(
    df: DataFrame,
    clusters: DataFrame,
    test_permille: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-free train/test split: assign the split by near-dup
    CLUSTER, not by document, so a test document's near-duplicate can
    never sit in train (the standard post-dedup practice — a doc-level
    split leaks because the retained twin of an eval doc inflates the
    benchmark; see the contamination literature around Lee et al. 2021).

    ``clusters`` is dup_clusters output (node, cluster): every document
    mapped to its canonical keeper id, isolated docs to themselves. The
    split decision hashes the CLUSTER id through the same Knuth bucket
    as train_test_split, so (a) all members of a component land on one
    side by construction, and (b) an un-clustered corpus degrades to
    exactly train_test_split's assignment. One broadcast-able join, one
    integer comparison — no rand(), stable under reruns and reordering.

    Returns (id, cluster, split).
    """
    joined = df.select(F.col(id_col).alias("id")).join(
        clusters.select(F.col("node").alias("id"), "cluster"), "id", "left"
    )
    cluster_id = F.coalesce(F.col("cluster"), F.col("id"))
    return joined.select(
        "id",
        cluster_id.alias("cluster"),
        F.when(_bucket(cluster_id) < test_permille, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def sample_k_per_group(
    df: DataFrame,
    group: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-SIZE per-stratum sample: exactly min(k, |stratum|) rows per
    group — the eval-set builder's complement to ``stratified_sample``'s
    fixed-RATE draw (a rate sample of a tiny stratum can round to zero;
    benchmark suites need "50 docs per language" guarantees).

    Deterministic without rand(): rows are ranked inside each stratum by
    md5(id) — a uniform, data-independent order any engine reproduces
    (unlike xxhash64, md5 exists in DuckDB/Trino/Postgres, so the oracle
    is bit-exact) — and row_number keeps the first k. One exchange keyed
    on the stratum; the window never sees more than a stratum per task,
    and heavy strata stay sortable because only (group, hash, id) ride
    the shuffle, not the payload columns.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.select(F.col(group), F.col(id_col))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(group, id_col, "rn")
    )


def padding_efficiency(df: DataFrame, max_len: int = 64) -> DataFrame:
    """Padding-waste report for context-window planning: if every
    document were padded to its own ceil(n/L) windows of length L
    (chunk-then-pad, the no-packing baseline), how many tokens are
    real vs padding — and how close could greedy packing get (the
    lower bound ceil(total/L) windows)? Per source: doc count, token
    total, both window counts, and the two efficiency ratios. This is
    the report that justifies running pack_sequences at all.

    Map-side token counts + one grouped sum; the ratios divide exact
    integers in double (IEEE-identical across engines), rounded to 6.
    """
    from nnanalytics_spark.pipeline.text import tokens

    n = F.size(tokens(F.lower(F.col("text"))))
    per_doc = df.select(
        "source",
        n.alias("n_tok"),
        F.when(n > 0, F.ceil(n / F.lit(max_len))).otherwise(F.lit(0)).alias("bins"),
    )
    g = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("bins").alias("padded_windows"),
    )
    ideal = F.ceil(F.col("total_tokens") / F.lit(max_len))
    return g.select(
        "source",
        "n_docs",
        "total_tokens",
        "padded_windows",
        ideal.alias("packed_windows"),
        F.round(
            F.col("total_tokens") / (F.col("padded_windows") * max_len), 6
        ).alias("padded_efficiency"),
        F.round(F.col("total_tokens") / (ideal * max_len), 6).alias(
            "packed_efficiency"
        ),
    ).orderBy("source")


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight: Column | str,
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, rand()-free: the
    Efraimidis–Spirakis A-ES scheme (2006) — each row draws a key
    u^(1/w) with u uniform in (0,1) and the k largest keys win, which
    provably samples with probability proportional to weight. Training
    pipelines use it to bias corpus sampling toward quality scores
    while staying reproducible run-to-run.

    u derives from the id hash (pmod(id·KNUTH, M)+0.5)/M — same
    determinism contract as stratified_sample — and the key comparison
    uses ln(u)/w (monotone transform; avoids pow underflow at tiny
    weights). Keys are rounded to 9 dp with an id tie-break, so the cut
    is engine-exact. Plan: map-side key computation + a per-group
    row_number window; groups are the sampling strata, so the window
    partitions by them — global k uses the distributed-TakeOrdered
    variant below.

    A-ES is defined for w > 0 only: w = 0 would divide-by-zero into a
    NULL key and a negative w inverts the key ordering — either silently
    corrupts the sample (ADVICE r5). Non-positive-weight rows are
    therefore EXCLUDED up front, which is also the correct limit
    semantics (selection probability → 0 as w → 0⁺)."""
    from pyspark.sql.window import Window

    m = 1_000_000
    w = F.col(weight) if isinstance(weight, str) else weight
    df = df.filter(w > 0)
    u = (_bucket(F.col(id_col), m) + F.lit(0.5)) / F.lit(float(m))
    key = F.round(F.log(u) / w, 9)
    if group_col is None:
        ranked = (
            df.withColumn("_key", key)
            .orderBy(F.col("_key").desc(), F.col(id_col))
            .limit(k)
        )
        return ranked.drop("_key")
    win = Window.partitionBy(group_col).orderBy(F.col("_key").desc(), F.col(id_col))
    return (
        df.withColumn("_key", key)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_key", "_rn")
    )


def quantile_normalize(
    df: DataFrame,
    value: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rank-based score normalization per group: percent_rank of
    ``value`` within each group, with a deterministic (value, id)
    ordering so ties resolve identically everywhere. The curation
    primitive for mixing heterogeneous quality scores — a fastText
    score from one source and a length heuristic from another become
    comparable once both are uniform on [0,1] within their source.
    One window per group over (value, id); emitted as the exact
    (rank-1)/(n-1) rational cast to double."""
    from pyspark.sql.window import Window

    win = Window.partitionBy(group_col).orderBy(F.col(value), F.col(id_col))
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    rn = F.row_number().over(win)
    return df.select(
        id_col,
        group_col,
        value,
        F.when(n > 1, (rn - 1).cast("double") / (n - 1).cast("double"))
        .otherwise(0.0)
        .alias("q_norm"),
    )


def training_order(
    df: DataFrame,
    shards: int = 8,
    id_col: str = "doc_id",
    epoch: int = 0,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, position) so readers stream shard files in position order
    and see a reproducible pseudo-random permutation — the epoch
    shuffle a training pipeline bakes into its data layout rather than
    paying a full sort at read time. Different epochs derive different
    permutations from the same ids (the epoch offsets the Knuth hash),
    so multi-epoch runs reshuffle without re-writing inputs.

    Plan: the shuffle key is pmod((id + epoch·PRIME)·KNUTH, M) — the
    rand()-free determinism contract every sampler here uses — and the
    position is a row_number window PER SHARD (partitioned by the shard
    key, never a global sort). At 100 TB pick shards ≈ task count so
    each window partition is one writer's worth of data."""
    from pyspark.sql.window import Window

    m = 1_000_003  # prime modulus: id*KNUTH mod 2^k patterns would bias
    # reduce the id BEFORE adding the epoch offset: a raw id near 2^63
    # (xxhash64-derived) plus the offset would overflow int64 — and
    # modular arithmetic makes pmod(id, m) + off ≡ id + off (mod m), so
    # the oracle's (id + off) % m replay is unchanged
    key = _bucket(F.pmod(F.col(id_col).cast("long"), F.lit(m)) + F.lit(epoch * 40_503), m)
    shard = F.pmod(key, F.lit(shards)).cast("int")
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.withColumn("sort_key", key)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w) - 1)
        .drop("sort_key")
    )


def source_ablation(
    df: DataFrame,
    metric_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Leave-one-source-out ablation of a corpus-level mean — the
    cheapest data-valuation signal a mixture owner reads before
    re-weighting: for each source, what the corpus mean metric becomes
    WITHOUT it, and the delta that source contributes. A source whose
    removal RAISES mean quality is a pruning candidate; one whose
    removal craters coverage is load-bearing. Closed form from
    per-source aggregates — never a per-source rescan:
    loo_mean_s = (S − s_s)/(N − n_s) from one grouped pass + broadcast
    totals. DECIMAL sums keep every mean order-free; rounds to 6.

    Returns one row per source: n_docs, share, mean_in_source,
    loo_mean, delta (= full mean − loo_mean: positive means the source
    pulls the corpus mean UP)."""
    dec = "decimal(28,9)"
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col(metric_col), 9).cast("decimal(18,9)")).cast(dec).alias("_s"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("_n"), F.sum("_s").cast(dec).alias("_ss")
    )
    full_mean = F.col("_ss").cast("double") / F.col("_n")
    # a source that IS the whole corpus leaves nothing behind when
    # removed: its leave-one-out mean is undefined — NULL loo/delta
    # (diagnosable), never an ANSI divide error
    loo = F.when(
        F.col("_n") > F.col("n_docs"),
        (F.col("_ss") - F.col("_s")).cast("double") / (F.col("_n") - F.col("n_docs")),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs") / F.col("_n"), 6).alias("share"),
            F.round(F.col("_s").cast("double") / F.col("n_docs"), 6).alias(
                "mean_in_source"
            ),
            F.round(loo, 6).alias("loo_mean"),
            F.round(full_mean - loo, 6).alias("delta"),
        )
    )
