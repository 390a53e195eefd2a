"""Hadoop block-codec (Lz4Codec / SnappyCodec) wire-format tests: the
pure-Python decoders against pyarrow's real compressors (match-rich
data exercises copy/overlap paths literal-only fixtures cannot), the
fallback encoders against both decoders, framing round-trips, and the
truncation guards."""

from __future__ import annotations

import struct

import pytest

from nnanalytics_spark.sources import blockcodec as bc

#: match-rich corpus: repeated runs at several offsets, overlapping
#: copies (run length > distance), and incompressible tails
SAMPLES = [
    b"",
    b"x",
    b"abcabcabcabcabcabcabcabc",  # overlap: offset 3, long run
    b"the quick brown fox " * 200,
    bytes(range(256)) * 40,  # long offsets
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # offset-1 RLE overlap
    (b"header" + bytes(7000) + b"trailer") * 3,  # zero runs
    b"".join(bytes([i % 251]) for i in range(10_000)),  # mostly incompressible
]


def _pa(codec):
    import pyarrow as pa

    return pa.Codec({"lz4": "lz4_raw", "snappy": "snappy"}[codec])


@pytest.mark.parametrize("data", SAMPLES, ids=range(len(SAMPLES)))
def test_lz4_pure_decoder_inflates_real_compressor_output(data):
    comp = bytes(_pa("lz4").compress(data))
    assert bc.lz4_block_decompress(comp) == data


@pytest.mark.parametrize("data", SAMPLES, ids=range(len(SAMPLES)))
def test_snappy_pure_decoder_inflates_real_compressor_output(data):
    comp = bytes(_pa("snappy").compress(data))
    assert bc.snappy_block_decompress(comp) == data


@pytest.mark.parametrize("codec", ["lz4", "snappy"])
@pytest.mark.parametrize("data", SAMPLES[1:], ids=range(1, len(SAMPLES)))
def test_literal_only_fallback_encoders_are_valid_streams(codec, data):
    """The no-pyarrow fallback writes literal-only streams every
    compliant decoder (incl. the real one) must inflate."""
    enc = bc._lz4_literal_only if codec == "lz4" else bc._snappy_literal_only
    dec = (
        bc.lz4_block_decompress if codec == "lz4" else bc.snappy_block_decompress
    )
    stream = enc(data)
    assert dec(stream) == data
    assert bytes(_pa(codec).decompress(stream, len(data))) == data


@pytest.mark.parametrize("codec", ["lz4", "snappy"])
def test_hadoop_framing_roundtrip_multi_block(codec):
    """block_size smaller than the payload forces multiple framed
    blocks; the streaming decoder reassembles them exactly."""
    data = (b"NNAnalytics block codec roundtrip " * 997)[:24_001]
    stream = bc.hadoop_block_compress(data, codec, block_size=4096)
    # 4-byte BE uncompressed length of the first block
    assert struct.unpack(">i", stream[:4])[0] == 4096
    import io

    fh = io.BytesIO(stream)
    out = b"".join(bc.hadoop_block_decompress_iter(fh.read, len(stream), codec))
    assert out == data


@pytest.mark.parametrize("codec", ["lz4", "snappy"])
def test_hadoop_framing_truncation_raises(codec):
    import io

    data = b"payload " * 1000
    stream = bc.hadoop_block_compress(data, codec, block_size=1024)
    cut = stream[: len(stream) - 5]
    fh = io.BytesIO(cut)
    with pytest.raises(ValueError, match="truncated|short read"):
        b"".join(bc.hadoop_block_decompress_iter(fh.read, len(cut), codec))


def test_lz4_handcrafted_overlap_sequence():
    """Spec fixture written by hand: literal 'abc', then a match of
    length 9 at offset 3 — the overlapping copy must repeat the
    3-byte window three times."""
    #       token: lit=3, match=9-4=5 -> 0x35 ; offset 3 little-endian
    stream = bytes([0x35]) + b"abc" + bytes([0x03, 0x00])
    assert bc.lz4_block_decompress(stream) == b"abc" + b"abc" * 3


def test_snappy_handcrafted_copy_elements():
    """Literal 'abcd' + copy1 (len 4, offset 4) + copy2 (len 3,
    offset 2) over a hand-built preamble."""
    body = bytes([(4 - 1) << 2]) + b"abcd"  # literal, len 4
    body += bytes([(0 << 5) | ((4 - 4) << 2) | 1, 4])  # copy1 len4 off4
    body += bytes([((3 - 1) << 2) | 2, 2, 0])  # copy2 len3 off2
    stream = bytes([11]) + body  # preamble varint: 4+4+3
    assert bc.snappy_block_decompress(stream) == b"abcdabcdcd" + b"c"


def test_bad_offsets_raise():
    with pytest.raises(ValueError, match="offset"):
        bc.lz4_block_decompress(bytes([0x15]) + b"a" + bytes([0x05, 0x00]))
    with pytest.raises(ValueError, match="offset"):
        bc.snappy_block_decompress(bytes([5, (0 << 2) | 0]) + b"a" + bytes([1, 9]))


def test_truncated_raw_blocks_raise_valueerror_not_indexerror():
    """ADVICE r7: byte reads past the end of truncated input must raise
    ValueError (which _inflate_sections re-wraps with section context),
    never a raw IndexError."""
    # lz4: token promises a 255-run literal length extension, input ends
    with pytest.raises(ValueError):
        bc.lz4_block_decompress(bytes([0xF0]))
    # lz4: match offset cut in half
    with pytest.raises(ValueError):
        bc.lz4_block_decompress(bytes([0x10]) + b"a" + bytes([0x01]))
    # snappy: truncated preamble varint (continuation bit set, no next byte)
    with pytest.raises(ValueError):
        bc.snappy_block_decompress(bytes([0x80]))
    # snappy: 2-byte copy offset with only one byte left
    with pytest.raises(ValueError):
        bc.snappy_block_decompress(bytes([5, (0 << 2) | 0]) + b"a" + bytes([2, 9]))
    # snappy: multi-byte literal length extension truncated
    with pytest.raises(ValueError):
        bc.snappy_block_decompress(bytes([5, (60 << 2) | 0]))


def test_unknown_codec_rejected():
    with pytest.raises(ValueError, match="codec"):
        bc.hadoop_block_compress(b"x", "zstd")
    with pytest.raises(ValueError, match="codec"):
        list(bc.hadoop_block_decompress_iter(lambda n: b"", 1, "zstd"))
