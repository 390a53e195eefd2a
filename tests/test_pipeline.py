"""Dedup / similarity / text / multimodal operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick  brown fox jumps over the lazy dog"),  # case/ws dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (4, "completely different text about spark engines"),
        (5, "der hund und die katze und der vogel ist da"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_collapses_case_whitespace(docs):
    out = {r["norm_text"]: (r["keep_id"], r["dup_count"]) for r in dedup.exact_dedup(docs).collect()}
    assert out["the quick brown fox jumps over the lazy dog"] == (1, 2)
    assert sum(v[1] for v in out.values()) == 6


def test_shingles(docs):
    row = docs.filter("doc_id = 1").select(dedup.shingles(F.col("text"), 3)).head()[0]
    assert "the quick brown" in row
    assert len(row) == 7  # 9 tokens → 7 trigrams


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 3) in ids  # differs by one word
    assert all(r["jaccard"] <= 1.0 for r in pairs)


def test_ngram_jaccard_hot_shingle_bound_stays_exact(spark):
    """The skew bound must not change emitted VALUES: with a boilerplate
    shingle hot enough to cross the cutoff, every candidate pair that
    shares a rare shingle gets the identical exact Jaccard as the
    unbounded plan (the hot-common count is recovered from the per-doc
    hot lists), and only all-hot-overlap pairs may disappear."""
    # 8 docs sharing the boilerplate prefix (hot trigrams, df=8 > cutoff 4)
    # with distinct tails; two docs also share a rare tail trigram.
    rows = [
        (i, f"terms of service apply here always tail{i} unique{i} word{i}")
        for i in range(8)
    ]
    rows[6] = (6, "terms of service apply here always shared rare tail")
    rows[7] = (7, "terms of service apply here always shared rare tail plus")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    bounded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=4).collect()
    }
    assert bounded  # the rare-sharing pair family survives
    for pair, jac in bounded.items():
        assert jac == exact[pair], pair  # exact value, hot commons included
    # (6,7) share rare shingles → must survive with the full-set Jaccard
    assert (6, 7) in bounded
    # dropped pairs (if any) shared ONLY hot shingles
    for pair in set(exact) - set(bounded):
        assert pair not in bounded and exact[pair] < 0.5


def test_contamination_hot_bound_stays_exact(spark):
    """Same exactness contract for the containment scan: a hot shingle on
    the train side is excluded from candidate generation but still counts
    toward the overlap of surviving pairs."""
    boiler = "terms of service apply here always"
    train = spark.createDataFrame(
        [(i, f"{boiler} train{i} filler{i} extra{i}") for i in range(6)]
        + [(6, f"{boiler} gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, f"{boiler} gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    unbounded = {
        (r["train_id"], r["eval_id"]): (r["n_common"], r["overlap_frac"])
        for r in dedup.contamination_pairs(train, evals, min_overlap_frac=0.0).collect()
    }
    bounded = {
        (r["train_id"], r["eval_id"]): (r["n_common"], r["overlap_frac"])
        for r in dedup.contamination_pairs(
            train, evals, min_overlap_frac=0.0, max_shingle_df=3
        ).collect()
    }
    assert (6, 100) in bounded
    for pair, vals in bounded.items():
        assert vals == unbounded[pair], pair
    assert bounded[(6, 100)][1] == 1.0  # fully contained, hot commons counted


def test_minhash_lsh_catches_duplicates(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, k=32, bands=16).collect()}
    assert (1, 2) in pairs  # exact dup after normalization always collides


def test_simhash_identical_for_same_tokens(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "xyz abc 123 wq")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["sig"] for r in df.select("doc_id", dedup.simhash(F.col("text")).alias("sig")).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_simhash_quadrant_recall(spark):
    """Pigeonhole guarantee: any pair within Hamming 3 must be found, no
    matter WHICH bits differ. Perturbations at bits 50/55/60 all land in
    quadrant 3 — the single-high-16-block scheme this replaced missed
    every such pair (the block key itself changed); quadrant blocking
    finds it via the three untouched quadrants."""
    base = 0x0123_4567_89AB_CDEF
    rows = [
        (1, base),
        (2, base ^ (1 << 50) ^ (1 << 55) ^ (1 << 60)),  # ham 3, all in q3
        (3, base ^ (1 << 5) ^ (1 << 21) ^ (1 << 50)),  # ham 3, spans q0/q1/q3
        (4, base ^ 0b1111),  # ham 4 — must NOT be emitted vs base
        (5, 0x7654_3210_FEDC_BA98),  # far from everything
    ]
    df = spark.createDataFrame(rows, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs_from_sigs(df, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 3 and got[(1, 3)] == 3
    assert (1, 4) not in got and (1, 5) not in got
    # pair (2,3): differs at bits 5,21,55,60 -> ham 4, excluded
    assert (2, 3) not in got


def test_simhash_quadrant_recall_exhaustive(spark):
    """Every possible 3-bit perturbation pattern across quadrants is
    recovered: flip one random bit per chosen quadrant for all C(4,3)
    quadrant subsets plus same-quadrant triples."""
    import itertools
    import random

    random.seed(11)

    def signed(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    base_u = 0xFEDC_BA98_7654_3211  # sign bit set — exercises that region
    rows = [(0, signed(base_u))]
    expected = set()
    nid = 1
    for quads in itertools.combinations_with_replacement(range(4), 3):
        bits = set()
        while len(bits) < 3:
            q = quads[len(bits)]
            bits.add(16 * q + random.randrange(16))
        sig_u = base_u
        for b in bits:
            sig_u ^= 1 << b
        rows.append((nid, signed(sig_u)))
        expected.add((0, nid))
        nid += 1
    df = spark.createDataFrame(rows, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_pairs_from_sigs(df, max_hamming=3).collect()
        if r["id_a"] == 0
    }
    assert expected <= got


def test_simhash_multiblock_recall_parity(spark):
    """blocks is a fan-out dial, not a semantics dial: any blocks >=
    max_hamming+1 must emit EXACTLY the same pair set (pigeonhole holds
    for each), so 4-, 6- and 8-block runs agree pair-for-pair on a
    corpus whose perturbations span every region including the sign
    bit."""
    import random

    random.seed(23)

    def signed(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    rows, nid = [], 0
    for base_u in (0x0123_4567_89AB_CDEF, 0xFEDC_BA98_7654_3211):
        rows.append((nid, signed(base_u)))
        nid += 1
        for _ in range(12):
            sig_u = base_u
            for b in random.sample(range(64), random.randrange(1, 6)):
                sig_u ^= 1 << b
            rows.append((nid, signed(sig_u)))
            nid += 1
    df = spark.createDataFrame(rows, "id long, sig long")

    def pairs(blocks):
        return {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_pairs_from_sigs(
                df, max_hamming=3, blocks=blocks
            ).collect()
        }

    p4 = pairs(4)
    assert p4 and p4 == pairs(6) == pairs(8)
    # wider radius needs more blocks: at blocks=8 the hamming<=7
    # guarantee holds, and the result must contain every <=3 pair
    p8 = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_pairs_from_sigs(df, max_hamming=7, blocks=8).collect()
    }
    assert {(a, b) for a, b, _h in p4} <= p8


def test_simhash_block_diagnostic(spark):
    """The diagnostic's candidate_pairs must equal the actual pre-filter
    join fan-out: sum of c*(c-1)/2 over each block's buckets."""
    rows = [(i, (i % 4) * 17) for i in range(12)]  # 4 distinct sigs x3 each
    df = spark.createDataFrame(rows, "id long, sig long")
    d = {r["block"]: r for r in dedup.simhash_block_diagnostic(df, blocks=4).collect()}
    assert set(d) == {0, 1, 2, 3}
    # low quadrant: values {0,17,34,51} each x3 -> 4 buckets, 4*3 pairs
    assert d[0]["n_buckets"] == 4 and d[0]["candidate_pairs"] == 4 * 3
    # high quadrants: all 12 sigs collapse to value 0 -> 66 candidates
    assert d[3]["n_buckets"] == 1 and d[3]["candidate_pairs"] == 66


def test_cosine_identity(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.0]), (3, [-1.0, -2.0, -3.0])],
                               "vec_id long, embedding array<double>")
    pairs = similarity.all_pairs_above(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in pairs] == [(1, 2, 1.0)]


def test_all_pairs_blocked_matches_broadcast(spark):
    """The no-driver-collect block path must produce exactly the broadcast
    baseline's pairs (VERDICT r1 #3) — same ids, same rounded cosines —
    across multiple blocks including cross-block pairs."""
    import random

    random.seed(7)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    rows += [(1000 + i, [x * 2.0 for x in rows[i][1]]) for i in range(5)]  # dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.all_pairs_above(df, threshold=0.5).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.all_pairs_above_blocked(
            df, threshold=0.5, rows_per_block=16
        ).collect()
    }
    assert blocked == base
    assert (0, 1000) in blocked  # scaled copy → cosine 1.0 cross-block
    # dispatch: a corpus above the broadcast limit takes the blocked plan
    plan = similarity.all_pairs_above(df, 0.5, broadcast_limit=10)._jdf.queryExecution()
    assert "FlatMapGroupsInPandas" in plan.executedPlan().toString()


def test_brute_force_topk(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 6)], "vec_id long, embedding array<double>"
    )
    top = similarity.brute_force_topk(df, [1.0, 0.0], k=2).collect()
    assert top[0]["vec_id"] == 5  # most aligned with x-axis


def test_lsh_bucketed_pairs_subset_of_exact(spark):
    import random

    random.seed(11)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(30)]
    rows += [(100, rows[0][1][:])]  # exact duplicate vector of id 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in similarity.lsh_bucketed_pairs(df, 0.99, bits=8, dim=8).collect()}
    assert (0, 100) in got


def test_text_features(docs):
    out = {r["doc_id"]: r for r in text.with_text_features(docs).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[6]["n_tokens"] == 0
    assert out[5]["pred_lang"] == "de"
    assert out[1]["pred_lang"] == "en"
    assert 0.0 <= out[1]["quality"] <= 1.0
    # doc 2 differs from doc 1 only in case/whitespace → same fingerprint
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert isinstance(out[1]["fingerprint"], int)


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in df.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[1] == fp[2]  # case + whitespace normalized
    assert fp[1] != fp[3]


def test_multimodal_feature_extraction(spark):
    media = multimodal.synthetic_media(spark, n=12)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 12
    kinds = {r["media_id"]: r["kind"] for r in out}
    for r in out:
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 8
        if r["kind"] in ("image", "video"):
            # normalized intensity/byte histogram sums to 1
            assert abs(sum(r["feature"]) - 1.0) < 1e-6
        else:
            # audio: per-segment RMS of centered PCM, each in [0, 1]
            assert all(0.0 <= f <= 1.0 for f in r["feature"])
    assert set(kinds.values()) == {"image", "audio", "video"}
    # deterministic: same payload → same checksum
    again = {r["media_id"]: r["checksum"] for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["checksum"] for r in out)


def test_multimodal_content_summary_matches_decode(spark):
    """content_summary's (count, sum) must equal the decoded content
    exactly for all three codecs, and (0, -1) must mark undecodable
    payloads — the contract the multimodal_features oracle relies on."""
    from nnanalytics_spark.pipeline import codecs

    data = bytes(range(1, 100))
    n, s = codecs.content_summary(codecs.encode_wav(data, sample_rate=8000), "audio")
    assert (n, s) == (99, sum(data))
    n, s = codecs.content_summary(codecs.encode_png(data, width=64), "image")
    assert (n, s) == (128, sum(data))  # zero-padded to two 64-wide rows
    assert codecs.content_summary(b"not a container", "image") == (0, -1)
    assert codecs.content_summary(None, "audio") == (0, -1)
    media = multimodal.synthetic_media(spark, n=9)
    for r in multimodal.extract_features(media).collect():
        assert r["n_content"] > 0 and r["content_checksum"] >= 0


def test_documents_corpus_is_ascii(spark):
    """The audio_rms_features and multimodal_features oracles equate
    DuckDB's per-CHARACTER code points with Spark's per-UTF-8-BYTE PCM
    samples — identical only for ASCII text. Pin that precondition so a
    future testdata generator emitting non-ASCII fails HERE with a clear
    message instead of as a silent hash mismatch (ADVICE r5 #1)."""
    import os

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if not os.path.isdir(sf):
            continue
        bad = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .filter(~F.col("text").rlike(r"^[\x00-\x7F]*$"))
            .count()
        )
        assert bad == 0, (
            f"{sf}/documents has {bad} non-ASCII texts; the byte-vs-"
            "codepoint oracles (audio_rms_features, multimodal_features) "
            "no longer hold — switch them to octet_length arithmetic"
        )


def test_multimodal_resize_fixes_payload_size(spark):
    from nnanalytics_spark.pipeline import codecs

    media = multimodal.synthetic_media(spark, n=9)
    out = multimodal.resize(media, 16, 16).collect()
    assert len(out) == 9
    for r in out:
        assert r["width"] == 16 and r["height"] == 16
        if r["kind"] == "image":
            # real path: output is a valid PNG of the target geometry
            d = codecs.decode_png(bytes(r["payload"]))
            assert (d["width"], d["height"]) == (16, 16)
        else:
            assert len(r["payload"]) == 256
    # deterministic
    again = {r["media_id"]: r["payload"] for r in multimodal.resize(media, 16, 16).collect()}
    assert all(again[r["media_id"]] == r["payload"] for r in out)


def test_codecs_wav_roundtrip():
    from nnanalytics_spark.pipeline import codecs

    data = bytes(range(256)) * 3 + b"tail"
    meta = codecs.decode_wav(codecs.encode_wav(data))
    assert meta["pcm"] == data
    assert meta["sample_rate"] == codecs.WAV_RATE and meta["n_channels"] == 1
    assert meta["n_samples"] == len(data)
    assert meta["duration_ms"] == len(data) * 1000 // codecs.WAV_RATE
    assert codecs.decode_wav(codecs.encode_wav(b""))["n_samples"] == 0
    import pytest

    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxWAVE")  # no fmt/data chunks
    with pytest.raises(ValueError):
        codecs.decode_wav(b"not a wav at all")


def test_codecs_png_roundtrip_all_filters():
    from nnanalytics_spark.pipeline import codecs

    data = bytes((i * 37 + 11) % 256 for i in range(1000))
    # encoder cycles filters (0,1,2,3,4) per row, so a 16-row image
    # exercises every unfilter branch including Paeth
    png = codecs.encode_png(data, width=64)
    d = codecs.decode_png(png)
    n, h = len(data), (len(data) + 63) // 64
    assert (d["width"], d["height"], d["bit_depth"]) == (64, h, 8)
    flat = d["pixels"].reshape(-1)
    assert bytes(flat[:n]) == data  # exact pixel recovery
    assert (flat[n:] == 0).all()  # zero-padded last row
    import pytest

    bad = bytearray(png)
    bad[30] ^= 0xFF
    with pytest.raises(ValueError):  # chunk CRC verified
        codecs.decode_png(bytes(bad))


def test_decode_media_matches_arithmetic_contract(spark):
    from nnanalytics_spark.pipeline import codecs

    docs = spark.createDataFrame(
        [(i, "doc text %d " % i * (i + 1)) for i in range(20)], "doc_id long, text string"
    )
    out = {r["media_id"]: r for r in multimodal.decode_media(
        multimodal.media_from_documents(docs)).collect()}
    for i in range(20):
        n = len(("doc text %d " % i * (i + 1)).encode("utf-8"))
        r = out[i]
        if i % 2 == 0:
            h = max((n + 63) // 64, 1)
            assert (r["kind"], r["width"], r["height"], r["n_data"]) == ("image", 64, h, 64 * h)
            assert r["sample_rate"] is None
        else:
            assert (r["kind"], r["sample_rate"], r["n_channels"]) == ("audio", codecs.WAV_RATE, 1)
            assert r["duration_ms"] == n * 1000 // codecs.WAV_RATE
            assert r["n_data"] == n
            assert r["width"] is None


def test_multimodal_frame_sampling(spark):
    from nnanalytics_spark.pipeline import codecs

    media = multimodal.synthetic_media(spark, n=12)  # kinds cycle i%3
    out = multimodal.sample_frames(media, every_ms=500).collect()
    videos = {r["media_id"] for r in out}
    assert videos == {2, 5, 8, 11}  # only kind == video
    px = codecs.AVI_WIDTH * codecs.AVI_HEIGHT
    per_video = {}
    for r in out:
        per_video.setdefault(r["media_id"], []).append(r)
    for mid, frames in per_video.items():
        # synthetic video i carries 256+i bytes -> 3 AVI frames @5fps -> 600 ms
        n_frames = max((256 + mid + px - 1) // px, 1)
        duration = n_frames * 1000 // codecs.AVI_FPS
        assert len(frames) == max(duration // 500, 1)
        for f in frames:
            assert f["ts_ms"] in (0, 500)
            assert f["frame_idx"] == f["ts_ms"] * codecs.AVI_FPS // 1000
            # real decoded frames: top-down grayscale, exactly w*h bytes
            assert len(f["payload"]) == px
    # the k=0 frame is the FIRST 128 source bytes, decoded exactly
    first = {r["media_id"]: bytes(r["payload"]) for r in out if r["ts_ms"] == 0}
    for mid in (2, 5, 8, 11):
        data = bytes(((mid * 131 + j * 17) % 256) for j in range(256 + mid))
        assert first[mid] == data[:px]


def test_codecs_avi_roundtrip():
    import numpy as np

    from nnanalytics_spark.pipeline import codecs

    data = bytes((j * 7) % 256 for j in range(300))
    payload = codecs.encode_avi(data)
    meta = codecs.decode_avi(payload)
    assert (meta["width"], meta["height"], meta["fps"]) == (16, 8, 5)
    assert meta["n_frames"] == 3  # ceil(300/128)
    assert meta["duration_ms"] == 600
    flat = np.concatenate([f.ravel() for f in meta["frames"]])
    assert bytes(flat.tobytes()[: len(data)]) == data  # pixels round-trip exactly
    assert all(b == 0 for b in flat.tobytes()[len(data):])  # zero padding
    assert abs(sum(codecs.avi_features(payload)) - 1.0) < 1e-9
    for bad in (b"nope", payload[:30], payload[:200]):
        try:
            codecs.decode_avi(bad)
            raise AssertionError("malformed AVI accepted")
        except ValueError:
            pass


def test_stratified_sample_deterministic_and_rated(spark):
    from nnanalytics_spark.pipeline import sampling

    rows = [(i, f"src{i % 4}", f"text {i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = sampling.stratified_sample(df, {"src0": 0, "src1": 1000}, default_permille=500)
    by_src = {r["source"]: r["cnt"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert "src0" not in by_src                     # rate 0 -> nothing
    assert by_src["src1"] == 500                    # rate 1000 -> everything
    assert 150 < by_src["src2"] < 350               # ~50% of 500
    # deterministic: same rows every run
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in kept.collect())
    assert ids1 == ids2


def test_bucket_negative_and_huge_ids(spark):
    """ADVICE r1: xxhash64-derived ids are negative half the time and can
    exceed 2^63/KNUTH; the bucket must stay in [0, modulus) for all of
    them (no ANSI overflow, no sign-preserving % leak), equal to
    pmod(id * KNUTH, m) computed in unbounded integers."""
    from nnanalytics_spark.pipeline import sampling

    ids = [-(2**62), -4_000_000_000, -17, -1, 0, 1, 17,
           3_470_000_000, 4_000_000_000, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    for m in (16, 1000):
        got = {
            r["doc_id"]: r["b"]
            for r in df.select(
                "doc_id", sampling._bucket(F.col("doc_id"), m).alias("b")
            ).collect()
        }
        for i in ids:
            assert got[i] == (i * sampling.KNUTH) % m, (i, m)
    # sharded ids land strictly inside the documented contract range
    sharded = sampling.shard_assign(df, 8)
    assert all(0 <= r["shard"] < 8 for r in sharded.collect())


def test_train_test_split_and_shards(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    split = sampling.train_test_split(df, test_permille=200)
    counts = {r["split"]: r["cnt"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts["test"] + counts["train"] == 1000
    assert 100 < counts["test"] < 300
    sharded = sampling.shard_assign(df, 8)
    shards = {r["shard"] for r in sharded.select("shard").distinct().collect()}
    assert shards == set(range(8))
    # disjoint + stable
    assert sharded.groupBy("doc_id").agg(F.countDistinct("shard").alias("n")).filter(F.col("n") > 1).count() == 0


def test_lsh_verified_pairs_exact_precision(spark, docs):
    """Every emitted pair must carry its TRUE Jaccard and clear the
    threshold; the known near-dup pair (1,3) must be recalled; and
    results must be a subset of the exhaustive exact computation."""
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.lsh_verified_pairs(docs, threshold=0.3, k=32, bands=16).collect()}
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 3) in got          # fox/dog vs fox/cat near-dup
    assert set(got) <= set(exact)
    for pair, j in got.items():
        assert j == exact[pair] and j >= 0.3


def test_term_stats_tf_df_idf(docs):
    """'the' appears 2× in docs 1 and 3, 1× in doc 2 (capitalized 'The'
    is a distinct term) → tf=5, df=3; idf uses the smoothed formula over
    the 6-doc corpus; empty doc contributes no terms."""
    import math

    out = {r["term"]: r for r in text.term_stats(docs, k=1000).collect()}
    assert out["the"]["tf"] == 5 and out["the"]["df"] == 3
    assert out["The"]["tf"] == 1 and out["The"]["df"] == 1
    assert out["the"]["idf"] == round(math.log(7 / 4), 6)
    assert "" not in out
    # top-1 by collection frequency is 'the'
    top = text.term_stats(docs, k=1).collect()
    assert top[0]["term"] == "the"


def test_dup_clusters_connected_components(docs):
    """Docs 1,2 are exact dups (case/ws) and 1,3 near-dups → one cluster
    {1,2,3} labeled by its min id; everything else is a singleton."""
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    out = {r["node"]: r["cluster"] for r in dedup.dup_clusters(docs, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6}


def test_dup_clusters_transitive_chain(spark):
    """A—B and B—C but no A—C pair: transitivity must still collapse all
    three into one cluster (the thing a pairs-only view cannot express)."""
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    out = {r["node"]: r["cluster"] for r in dedup.dup_clusters(docs, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_batch_topk_matches_brute_force(spark):
    """batch_topk over 3 query vectors must agree with per-query
    brute_force_topk on both membership and scores."""
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 3)
    got = similarity.batch_topk(corpus, queries, k=5)
    for qid in range(3):
        qvec = [float(x) for x in rows[qid][1]]
        expect = [(r["vec_id"], r["cos_sim"])
                  for r in similarity.brute_force_topk(corpus, qvec, k=5).collect()]
        mine = [(r["vec_id"], r["cos_sim"])
                for r in got.filter(F.col("query_id") == qid)
                          .orderBy("rank").collect()]
        assert mine == expect


def test_pack_sequences_offsets_and_chunks(spark):
    """Token stream: 5, 4, 8, 2 tokens with budget 8 → starts 0,5,9,17 →
    packs 0,0,1,2; offsets are exact prefix sums in doc_id order."""
    rows = [
        (1, "a b c d e"),
        (2, "f g h i"),
        (3, "j k l m n o p q"),
        (4, "r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "stream", F.lit(0)
    )
    from nnanalytics_spark.pipeline import sampling

    out = {r["doc_id"]: (r["n_tokens"], r["start_offset"], r["pack_id"])
           for r in sampling.pack_sequences(df, budget=8, shard_col="stream").collect()}
    assert out == {1: (5, 0, 0), 2: (4, 5, 0), 3: (8, 9, 1), 4: (2, 17, 2)}


def test_pack_sequences_default_auto_shards(spark):
    """Omitting shard_col must NOT build a single global window
    (VERDICT r1 #5): the default auto-shards by id, so the plan has no
    partitionBy(lit(0)) and every offset is a per-shard prefix sum."""
    rows = [(i, "w " * (i % 7 + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from nnanalytics_spark.pipeline import sampling

    out = sampling.pack_sequences(df, budget=8)
    assert "shard" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy(0)" not in plan and "Window [" in plan
    # per-shard offsets: within each shard, offsets are the prefix sums
    rows_out = out.select("doc_id", "shard", "n_tokens", "start_offset").collect()
    by_shard: dict[int, list] = {}
    for r in rows_out:
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in members:
            assert r["start_offset"] == run
            run += r["n_tokens"]


def test_repetition_signals(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),  # one distinct word, bigram "spam spam" ×3
            (1, "all words here are unique tokens"),
            (2, "one"),  # <2 tokens → null bigram
            (3, "a b a b c d"),  # tie "a b"×2 vs others ×1 → lexicographic
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.repetition_signals(docs).collect()}
    r0 = out[0]
    assert r0["n_words"] == 4 and r0["dup_word_frac"] == 0.75
    assert r0["top_bigram"] == "spam spam" and r0["top_bigram_count"] == 3
    assert r0["top_bigram_frac"] == 1.5  # 2*3/4, overlaps ignored
    r1 = out[1]
    assert r1["dup_word_frac"] == 0.0 and r1["top_bigram_count"] == 1
    r2 = out[2]
    assert r2["top_bigram"] is None and r2["top_bigram_count"] == 0
    assert r2["top_bigram_frac"] == 0.0
    r3 = out[3]
    assert r3["top_bigram"] == "a b" and r3["top_bigram_count"] == 2


def test_pii_scrub_and_counts(spark):
    rows = [
        (1, "mail me at a.b@example.com or call +1 (555) 123-4567 now"),
        (2, "ssn 123-45-6789 from host 10.0.0.1"),
        (3, "clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.with_pii_scrubbed(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "[EMAIL]" in out[1]["scrubbed"] and "[PHONE]" in out[1]["scrubbed"]
    assert "example.com" not in out[1]["scrubbed"]
    # ssn redacts as SSN (not PHONE) because it scrubs first
    assert out[2]["n_ssn"] == 1 and "[SSN]" in out[2]["scrubbed"]
    assert "[IPV4]" in out[2]["scrubbed"]
    assert out[3]["scrubbed"] == rows[2][1]


def test_contamination_pairs_containment(spark):
    """Eval doc fully contained in a train doc → overlap 1.0 even though
    Jaccard would be small; unrelated eval doc emits nothing."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "gamma delta epsilon zeta"), (101, "totally unrelated words here")],
        "doc_id long, text string",
    )
    out = dedup.contamination_pairs(train, evals, min_overlap_frac=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["train_id"], r["eval_id"], r["overlap_frac"]) == (1, 100, 1.0)


def test_centroid_eval_separable_labels(spark):
    """Two well-separated label clusters → centroids recover them and
    accuracy is 1.0 for both labels."""
    rows = [(i, 0, [10.0 + (i % 3), 0.0, 1.0]) for i in range(6)]
    rows += [(10 + i, 1, [0.0, 10.0 + (i % 3), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r["label"]: (r["n"], r["n_correct"], r["accuracy"])
           for r in similarity.centroid_eval(df).collect()}
    assert out == {0: (6, 6, 1.0), 1: (6, 6, 1.0)}


def test_dup_ngram_coverage(spark):
    """Hand-computable corpus: doc 1 and 2 share one trigram ('a b c'),
    doc 3 repeats it internally (both positions count as duplicated),
    doc 4 shares nothing, doc 5 is shorter than n."""
    rows = [
        (1, "a b c d e"),       # trigrams: abc bcd cde
        (2, "x a b c y"),       # trigrams: xab abc bcy
        (3, "a b c a b c"),     # trigrams: abc bca cab abc
        (4, "p q r s"),
        (5, "one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_ngrams"], r["n_dup_ngrams"], r["dup_frac"])
        for r in dedup.dup_ngram_coverage(df, n=3, min_docs=2).collect()
    }
    assert out[1] == (3, 1, round(1 / 3, 6))
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert out[3] == (4, 2, 0.5)  # 'a b c' at two positions, df=3 docs
    assert out[4] == (2, 0, 0.0)
    assert out[5] == (0, 0, 0.0)  # shorter than n → no n-grams


def test_norm_stats_unit_vectors(spark):
    rows = [(1, 0, [3.0, 4.0]), (2, 0, [6.0, 8.0]), (3, 1, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r for r in similarity.norm_stats(df).collect()}
    assert out[0]["n"] == 2 and out[0]["min_l2"] == 5.0 and out[0]["max_l2"] == 10.0
    assert out[0]["avg_l2"] == 7.5 and out[0]["avg_dim0"] == 4.5
    assert out[1]["avg_l2"] == 1.0 and out[1]["avg_dim0"] == 1.0


def test_quantization_error_bounds(spark):
    """MSE is bounded by (scale/2)^2 per component; zero vectors emit 0;
    a vector whose components are exact multiples of its scale
    reconstructs perfectly."""
    rows = [
        (1, 0, [127.0, -127.0, 0.0]),   # scale 1.0, exact multiples → mse 0
        (2, 1, [0.0, 0.0, 0.0]),        # zero vector → scale 0 → mse 0
        (3, 2, [1.0, 0.30, -0.77]),     # generic
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r for r in similarity.quantization_error(df).collect()}
    assert out[0]["avg_mse"] == 0.0 and out[0]["avg_scale"] == 1.0
    assert out[1]["avg_mse"] == 0.0 and out[1]["avg_scale"] == 0.0
    scale = 1.0 / 127
    assert 0.0 < out[2]["avg_mse"] <= (scale / 2) ** 2
    assert out[2]["avg_scale"] == round(scale, 6)


def test_remove_dup_spans(spark):
    """Hand-checkable rewrite: docs 1 and 2 share the 3-gram 'a b c';
    doc 1 (min id) keeps its copy, doc 2 loses exactly those 3 token
    positions; doc 3 shares nothing and is untouched."""
    df = spark.createDataFrame(
        [
            (1, "a b c x y"),
            (2, "p q a b c r"),
            (3, "u v w z k"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_dup_spans(df, n=3, min_docs=2).collect()
    }
    assert got[1] == ("a b c x y", 5, 0)
    assert got[2] == ("p q r", 6, 3)
    assert got[3] == ("u v w z k", 5, 0)


def test_remove_dup_spans_overlapping_and_full_cover(spark):
    """Overlapping duplicated grams union their cover; a doc that is one
    big duplicated span comes back empty rather than vanishing."""
    df = spark.createDataFrame(
        [
            (10, "a b c d"),  # keeper of both grams (abc, bcd)
            (11, "a b c d"),  # fully covered -> empty rewrite
            (12, "x a b c d"),  # covered positions 2-5 only
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.remove_dup_spans(df, n=3, min_docs=2).collect()
    }
    assert got[10] == ("a b c d", 0)
    assert got[11] == ("", 4)
    assert got[12] == ("x", 4)


# ---------------------------------------------------------------------------
# r4: gopher rules / DSIR / survivor selection / decontamination
# ---------------------------------------------------------------------------


def test_gopher_rules_flags(spark):
    df = spark.createDataFrame(
        [
            # passes everything (min_words lowered for the fixture)
            (1, "the cat and the dog walk to the house of wonder be good"),
            # too few words
            (2, "short text"),
            # no required stopwords, all-symbol words
            (3, "### $$$ %%% ^^^ &&& *** !!! ((( ))) ___ +++ === ~~~"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.gopher_rules(df, min_words=5, max_words=100).collect()
    }
    assert out[1]["passes"] is True
    assert out[2]["ok_word_count"] is False and out[2]["passes"] is False
    assert out[3]["ok_stopwords"] is False
    assert out[3]["ok_alpha_words"] is False
    assert out[3]["passes"] is False


def test_gopher_rules_line_fractions(spark):
    bullets = "\n".join(["- item %d" % i for i in range(10)])
    df = spark.createDataFrame([(1, bullets)], "doc_id long, text string")
    row = text.gopher_rules(df, min_words=1, max_bullet_frac=0.5).head()
    assert row["ok_bullet"] is False  # 100% bullet lines > 50%


def test_dsir_weights_prefer_target_like(spark):
    from nnanalytics_spark.pipeline import selection

    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "tgt"),
            (2, "alpha beta gamma beta", "raw"),   # target-like tokens
            (3, "delta epsilon zeta eta", "raw"),  # nothing target-like
        ],
        "doc_id long, text string, source string",
    )
    w = {
        r["doc_id"]: float(r["weight"])
        for r in selection.dsir_weights(df, F.col("source") == "tgt").collect()
    }
    assert w[2] > w[3]  # target-shaped doc scores higher


def test_dsir_topk_deterministic(spark):
    from nnanalytics_spark.pipeline import selection

    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "zeta eta", "tgt" if i == 1 else "raw")
         for i in range(1, 7)],
        "doc_id long, text string, source string",
    )
    top = selection.dsir_topk(df, F.col("source") == "tgt", k=3).collect()
    assert [r["doc_id"] for r in top] == [1, 3, 5]  # odd docs are target-like


def test_keep_best_prefers_quality_then_low_id(spark):
    df = spark.createDataFrame(
        [
            (1, "aa bb", 10),
            (2, "aa  bb", 30),   # same normalized text, higher quality -> wins
            (3, "AA BB", 30),    # ties with 2 on quality -> lower id (2) wins
            (4, "unique doc", 5),
        ],
        "doc_id long, text string, quality long",
    )
    out = {
        r["norm_text"]: (r["keep_id"], r["keep_quality"], r["dup_count"])
        for r in dedup.keep_best(df, quality_col="quality").collect()
    }
    assert out["aa bb"] == (2, 30, 3)
    assert out["unique doc"] == (4, 5, 1)


def test_keep_best_default_length(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x  y")], "doc_id long, text string"
    )
    row = dedup.keep_best(df).head()
    # normalized texts equal; doc 2's RAW text is longer -> higher quality
    assert row["keep_id"] == 2 and row["dup_count"] == 2


def test_decontaminate_drops_overlapping_train_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about database engines here"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    kept = dedup.decontaminate(train, evals, min_overlap_frac=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # bounded-df path returns the same answer
    kept2 = dedup.decontaminate(train, evals, min_overlap_frac=0.5, max_shingle_df=2)
    assert [r["doc_id"] for r in kept2.collect()] == [2]


def test_temperature_mixture_flattens_toward_uniform(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small", 100) for i in range(100)],
        "doc_id long, source string, n_chars long",
    )
    out = {r["source"]: r for r in sampling.temperature_mixture(df, temperature=5.0).collect()}
    # temperature scaling must pull the small source's rate ABOVE its
    # natural share and the big source's below
    assert out["small"]["rate"] > out["small"]["natural_share"]
    assert out["big"]["rate"] < out["big"]["natural_share"]
    assert abs(out["big"]["rate"] + out["small"]["rate"] - 1.0) < 1e-5


def test_temperature_one_is_natural(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame(
        [(1, "a", 300), (2, "b", 100)], "doc_id long, source string, n_chars long"
    )
    out = {r["source"]: r for r in sampling.temperature_mixture(df, temperature=1.0).collect()}
    assert out["a"]["rate"] == out["a"]["natural_share"] == 0.75


def test_incremental_exact_dedup(spark):
    corpus = spark.createDataFrame(
        [(1, "existing doc one"), (2, "existing doc two")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "Existing  doc one"),   # dup of corpus doc 1 -> dropped
            (11, "brand new doc"),       # survives
            (12, "brand  NEW doc"),      # batch-dup of 11 -> dropped
            (13, "another new doc"),     # survives
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup.incremental_exact_dedup(new, corpus).collect()
    )
    assert kept == [11, 13]


def test_hashed_classifier_scores_exact_and_thresholded(spark):
    from nnanalytics_spark.pipeline import selection

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha alpha"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in selection.hashed_classifier_scores(df, dim=16).collect()
    }

    def w(tok):
        h = 0
        for c in tok:
            h = (h * 31 + ord(c)) % 2147483647
        return ((h % 16) * 2654435761 + 104729) % 2001 - 1000

    exp1 = round((w("alpha") + w("beta")) / 2, 6)
    assert float(rows[1]["score"]) == exp1
    assert float(rows[2]["score"]) == w("alpha")  # mean of identical tokens
    assert rows[3]["n_tokens"] == 0 and float(rows[3]["score"]) == 0.0
    for r in rows.values():
        assert r["keep"] == (float(r["score"]) >= 0)


def test_hashed_classifier_is_expression_only(spark):
    from nnanalytics_spark.pipeline import selection

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    explained = (
        selection.hashed_classifier_scores(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in explained and "Python" not in explained


def test_top_fraction_per_group_exact_cut(spark):
    from nnanalytics_spark.pipeline import selection

    rows = [(i, "a" if i < 10 else "b", float(100 - i)) for i in range(14)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    kept = selection.top_fraction_per_group(df, 0.25).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # ceil(0.25*10)=3 best of group a (highest scores = lowest ids);
    # ceil(0.25*4)=1 best of group b
    assert sorted(by_src["a"]) == [0, 1, 2]
    assert by_src["b"] == [10]
    assert all(r["rank"] <= 3 for r in kept)


def test_top_fraction_tie_breaks_on_id(spark):
    from nnanalytics_spark.pipeline import selection

    df = spark.createDataFrame(
        [(3, "s", 1.0), (1, "s", 1.0), (2, "s", 1.0), (4, "s", 1.0)],
        "doc_id long, source string, score double",
    )
    kept = selection.top_fraction_per_group(df, 0.5).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]  # all-tied: lowest ids win


def test_chunk_documents_boundaries(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(70))), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"])
        for r in sampling.chunk_documents(df, max_tokens=32).collect()
    )
    # 70 tokens -> 32 + 32 + 6; 1 token -> one chunk; empty -> one empty chunk
    assert rows == [(1, 0, 32), (1, 1, 32), (1, 2, 6), (2, 0, 1), (3, 0, 0)]


def test_chunk_documents_roundtrip_text(spark):
    from nnanalytics_spark.pipeline import sampling

    txt = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(9, txt)], "doc_id long, text string")
    chunks = (
        sampling.chunk_documents(df, max_tokens=16)
        .orderBy("chunk_idx")
        .collect()
    )
    assert " ".join(c["chunk_text"] for c in chunks) == txt


def test_random_projection_preserves_relative_geometry(spark):
    """JL sanity on a controlled set: identical vectors project
    identically; a vector and its negation project to negations."""
    from nnanalytics_spark.pipeline import similarity as sim

    base = [float((i * 7) % 5 - 2) for i in range(64)]
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, [-x for x in base])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: [r[f"p{j}"] for j in range(8)]
            for r in sim.random_projection(df).collect()}
    assert rows[1] == rows[2]
    assert rows[3] == [-x if x != 0 else x for x in rows[1]]


def test_semdedup_within_cell_only(spark):
    """SemDeDup compares vectors only within a cell: two identical
    vectors assigned to DIFFERENT seed centroids both survive, while a
    within-cell duplicate is dropped under the smaller-id-survives rule.
    Seeds are orthogonal axes so assignment is unambiguous."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # seed cell 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # seed cell 1
        (10, [1.0, 0.1, 0.0, 0.0]),  # cell 0
        (11, [2.0, 0.2, 0.0, 0.0]),  # cell 0, cosine 1.0 with 10 → dup
        (20, [0.1, 1.0, 0.0, 0.0]),  # cell 1 — same direction family but
        (21, [0.2, 1.0, 0.0, 0.0]),  # high mutual cosine within cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: (r["cell"], r["keep"])
        for r in similarity.semdedup(
            df, eps=0.999, centroid_ids=[0, 1], rows_per_block=2
        ).collect()
    }
    assert out[0] == (0, True) and out[1] == (1, True)
    assert out[10] == (0, True)
    assert out[11] == (0, False)  # within-cell exact-direction dup of 10
    # 20/21 cosine ≈ 0.99523 < eps → both kept even though same cell
    assert out[20] == (1, True) and out[21] == (1, True)


def test_semdedup_blocked_kernel_matches_single_block(spark):
    """Pair discovery must be invariant to the block decomposition."""
    import random

    random.seed(11)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    rows += [(100 + i, [x * 1.5 for x in rows[i][1]]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = {
        (r["id"], r["cell"], r["keep"])
        for r in similarity.semdedup(
            df, eps=0.9, centroid_ids=[0, 1, 2, 3], rows_per_block=1000
        ).collect()
    }
    many = {
        (r["id"], r["cell"], r["keep"])
        for r in similarity.semdedup(
            df, eps=0.9, centroid_ids=[0, 1, 2, 3], rows_per_block=8
        ).collect()
    }
    assert one == many
    assert any(not k for (_, _, k) in one)  # the scaled copies dedup


def test_bigram_lm_closed_form(spark):
    """Add-one bigram NLL against hand-computed values: corpus 'a b a b'
    + 'x y' has unigrams a:2 b:2 x:1 y:1 (V=4), bigrams (a,b):2 (b,a):1
    (x,y):1."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in text.bigram_lm_scores(df).collect()}
    # doc 3 has one token → no bigram → excluded from SCORING, but its
    # token still counts toward the corpus vocabulary (V=5)
    assert set(out) == {1, 2}
    # d1: 2·(-ln((2+1)/(2+5))) + (-ln((1+1)/(2+5))) = 2·0.847298 + 1.252763
    assert out[1]["n_bigrams"] == 3
    # sum_nll is the DOUBLE nearest the exact decimal sum (pandas-
    # coercion-stable output; the decimal is still the accumulator)
    assert out[1]["sum_nll"] == float(Decimal("2.947359"))
    assert abs(out[1]["avg_nll"] - 0.982453) < 1e-6
    # d2: -ln((1+1)/(1+5))
    assert out[2]["sum_nll"] == float(Decimal("1.098612"))


def test_bigram_lm_separates_fluent_from_noise(spark):
    """Documents made of the corpus's stock phrasing score lower NLL than
    a same-length document of unique token soup."""
    stock = "the quick brown fox jumps over the lazy dog"
    rows = [(i, stock) for i in range(10)]
    rows.append((99, "zq8 xv7 wm2 kd9 pl4 rt6 bn1 cy3 hj5"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: float(r["avg_nll"]) for r in text.bigram_lm_scores(df).collect()}
    assert out[99] > out[0] * 2


def _py_poly(tok: str, base: int) -> int:
    h = 0
    for c in tok:
        h = (h * base + ord(c)) % 2147483647
    return h


def test_cluster_split_never_straddles(spark):
    from nnanalytics_spark.pipeline import sampling

    docs = spark.createDataFrame(
        [(i, f"doc body number {i}") for i in range(50)], "doc_id long, text string"
    )
    # components {0,7,13} and {20,21}; rest isolated
    pairs = spark.createDataFrame(
        [(0, 7), (7, 13), (20, 21)], "id_a long, id_b long"
    )
    clusters = dedup.dup_clusters(docs, pairs)
    out = {r["id"]: (r["cluster"], r["split"]) for r in
           sampling.cluster_split(docs, clusters, test_permille=500).collect()}
    assert len(out) == 50
    assert out[0][0] == out[7][0] == out[13][0] == 0
    # the whole component shares one split
    assert out[0][1] == out[7][1] == out[13][1]
    assert out[20][1] == out[21][1]
    # isolated docs degrade to train_test_split's per-id assignment
    tts = {r["doc_id"]: r["split"] for r in
           sampling.train_test_split(docs, test_permille=500).collect()}
    for i in range(22, 50):
        assert out[i][1] == tts[i]


def test_hashed_features_matches_python_replica(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "Gamma  delta"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["id"]: [r[f"f{j}"] for j in range(8)]
           for r in text.hashed_features(docs, dim=8).collect()}
    assert set(out) == {1, 2}  # empty doc excluded
    for doc_id, toks in ((1, ["alpha", "beta", "alpha"]), (2, ["gamma", "delta"])):
        expected = [0] * 8
        for t in toks:
            expected[_py_poly(t, 31) % 8] += 1 - 2 * (_py_poly(t, 37) % 2)
        assert out[doc_id] == expected, doc_id


def test_count_min_never_underestimates(spark):
    rows = [(i, "apple banana cherry date " * (1 + i % 3)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sketch = text.count_min_table(docs, width=4, depth=4)  # heavy collisions
    assert sketch.count() <= 4 * 4
    toks = docs.select(F.explode(text.tokens(F.lower(F.col("text")))).alias("tok"))
    exact = {r["tok"]: r["c"] for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()}
    qdf = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r["tok"]: r["cms_estimate"]
           for r in text.count_min_estimates(sketch, qdf, width=4).collect()}
    assert set(est) == set(exact)
    for t, c in exact.items():
        assert est[t] >= c, t


def test_kmeans_refine_means(spark):
    import numpy as np

    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),          # the seeds
        (10, [3.0, 0.0]), (11, [5.0, 1.0]),         # cell 0
        (20, [0.0, 3.0]),                           # cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = {r["cell"]: (r["n_members"], r["c0"], r["c1"])
           for r in similarity.kmeans_refine(df, cents).collect()}
    # cell 0 members: 0, 10, 11 → mean (3, 1/3); cell 1: 1, 20 → (0, 2)
    assert out[0] == (3, 3.0, round(1 / 3, 6))
    assert out[1] == (2, 0.0, 2.0)


def test_source_divergence_zero_for_proportional_source(spark):
    """A source whose token distribution equals the corpus distribution
    has KL exactly 0; a disjoint-vocabulary source has KL = ln(N/n_s)
    (its tokens appear nowhere else)."""
    import math
    from decimal import Decimal

    from nnanalytics_spark.pipeline import selection

    rows = (
        [(i, "a b", "s1") for i in range(6)]        # 12 tokens: a,b even
        + [(10 + i, "a b", "s2") for i in range(2)]  # same distribution
        + [(20, "zz zz zz zz", "s3")]                # disjoint vocab
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in selection.source_divergence(df).collect()}
    # s1 and s2 both have P(a)=P(b)=1/2; corpus restricted to {a,b} mass …
    # corpus: a=8, b=8, zz=4, N=20. P_s1(a)=.5 vs P(a)=.4 → KL > 0 equal
    # for s1 and s2 (identical distributions), and s3's KL = ln(20/4).
    assert out["s1"]["kl_nats"] == out["s2"]["kl_nats"]
    # kl_nats is the DOUBLE nearest the exact decimal sum
    assert out["s3"]["kl_nats"] == float(Decimal(str(round(math.log(20 / 4), 6))))
    assert out["s3"]["n_tokens"] == 4 and out["s3"]["n_distinct"] == 1


def test_minhash_portable_mode_same_shape_as_production(spark):
    """portable=True swaps the hash families, not the semantics: exact
    duplicate texts collide in EVERY band under both modes, and the
    portable candidate set contains every exact-dup pair. Values differ
    (different hash family) but stay in int64 — the overflow guarantee
    (2k+1)(P-1)+b < 2^63 the oracle relies on."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (3, "one two three four five six"),
            (4, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    for portable in (False, True):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(
                df, k=16, bands=4, portable=portable
            ).collect()
        }
        assert (1, 2) in pairs, portable
    sigs = dedup.minhash_signatures(df, k=16, portable=True).collect()
    for r in sigs:
        assert all(0 <= v < (1 << 63) for v in r["signature"])
    # verified path: the dup pair survives Jaccard, disjoint docs don't
    ver = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.lsh_verified_pairs(
            df, threshold=0.9, k=16, bands=4, portable=True
        ).collect()
    }
    assert ver == {(1, 2): 1.0}
