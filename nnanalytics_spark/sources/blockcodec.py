"""Hadoop block-compression codecs (Lz4Codec / SnappyCodec) for fsimage
sections — the last ingest gap vs the reference, which loads whatever
``dfs.image.compression.codec`` the image declares through Hadoop's
CompressionCodec factory (NameNodeLoader passes the FileSummary codec to
FSImageUtil's codec lookup; see
/root/reference/src/main/java/org/apache/hadoop/hdfs/server/namenode/NameNodeLoader.java:361).

Wire format (Hadoop BlockCompressorStream / BlockDecompressorStream):
a stream is a sequence of BLOCKS, each::

    [4-byte big-endian uncompressed block length U]
    repeat until U bytes produced:
        [4-byte big-endian compressed chunk length C][C chunk bytes]

Each chunk is an independent RAW codec block — LZ4 *block* format (no
frame header) for Lz4Codec, raw Snappy (varint uncompressed-length
preamble + literal/copy elements) for SnappyCodec. In practice Hadoop's
compressors emit exactly one chunk per block (the output buffer is sized
past the worst-case expansion), but the decoder here handles the
multi-chunk shape anyway.

Decode strategy: pyarrow's bundled C codecs (``lz4_raw`` / ``snappy``)
do the byte work — Snappy chunks self-describe their size via the
preamble varint, LZ4 chunks take the block's remaining uncompressed
length as the size hint. The pure-Python decoders below are the
fallback (pyarrow missing, or a multi-chunk LZ4 block where the hint
overshoots) and the format documentation; they implement the complete
public block formats, not a subset. Compression likewise prefers
pyarrow and falls back to valid literal-only streams (any compliant
decoder inflates them; ratio is irrelevant for the fallback's users —
fixtures and tests)."""

from __future__ import annotations

import struct

_SUPPORTED = ("lz4", "snappy")


def _pa_codec(codec: str):
    try:
        import pyarrow as pa

        return pa.Codec({"lz4": "lz4_raw", "snappy": "snappy"}[codec])
    except Exception:
        return None


# ---------------------------------------------------------------- raw LZ4


def lz4_block_decompress(data: bytes) -> bytes:
    """Pure-Python raw LZ4 *block* decode (the public block format:
    token byte = literal-length nibble | match-length nibble, 255-run
    length extensions, 2-byte little-endian match offsets, overlapping
    copies repeat the window). Self-terminating — needs no size hint.
    Truncated/malformed input raises ValueError (never IndexError —
    fsimage._inflate_sections' handler keys on ValueError to add
    section context; ADVICE r7)."""
    try:
        return _lz4_block_decompress(data)
    except IndexError:
        raise ValueError("lz4: truncated input") from None


def _lz4_block_decompress(data: bytes) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: literal run past end of input")
        out += data[pos : pos + lit]
        pos += lit
        if pos >= n:
            break  # last sequence carries literals only
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: bad match offset {offset} at {len(out)}")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping copy: the window repeats
            pattern = bytes(out[start:])
            reps = mlen // offset + 1
            out += (pattern * reps)[:mlen]
    return bytes(out)


def _lz4_literal_only(data: bytes) -> bytes:
    """Valid LZ4 block with a single literal sequence (no matches)."""
    lit = len(data)
    if lit < 15:
        head = bytes([lit << 4])
    else:
        rem = lit - 15
        head = bytes([0xF0]) + b"\xff" * (rem // 255) + bytes([rem % 255])
    return head + data


# ------------------------------------------------------------- raw Snappy


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    value, shift = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint")
        b = data[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7


def snappy_block_decompress(data: bytes) -> bytes:
    """Pure-Python raw Snappy decode (the public format: preamble
    varint of uncompressed length; elements tagged by the low 2 bits —
    00 literal, 01 copy/1-byte offset, 10 copy/2-byte LE offset,
    11 copy/4-byte LE offset). Truncated/malformed input raises
    ValueError (never IndexError; ADVICE r7)."""
    try:
        return _snappy_block_decompress(data)
    except IndexError:
        raise ValueError("snappy: truncated input") from None


def _snappy_block_decompress(data: bytes) -> bytes:
    expected, pos = _uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:
                nb = length - 59
                if pos + nb > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            length += 1
            if pos + length > n:
                raise ValueError("snappy: literal run past end of input")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:
            length = 4 + ((tag >> 2) & 0x7)
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(f"snappy: bad copy offset {offset} at {len(out)}")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:
            pattern = bytes(out[start:])
            reps = length // offset + 1
            out += (pattern * reps)[:length]
    if len(out) != expected:
        raise ValueError(f"snappy: produced {len(out)} bytes, preamble said {expected}")
    return bytes(out)


def _snappy_literal_only(data: bytes) -> bytes:
    """Valid raw Snappy stream of pure literals."""
    out = bytearray()
    n = len(data)
    # preamble varint
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    pos = 0
    while pos < n:
        chunk = min(n - pos, 60)
        out.append((chunk - 1) << 2)
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)


# ------------------------------------------------- chunk (de)compression


def _compress_chunk(data: bytes, codec: str) -> bytes:
    pa = _pa_codec(codec)
    if pa is not None:
        return bytes(pa.compress(data))
    return _lz4_literal_only(data) if codec == "lz4" else _snappy_literal_only(data)


def _decompress_chunk(data: bytes, codec: str, expected: int) -> bytes:
    """``expected`` = the block's remaining uncompressed length — exact
    for the (universal in practice) one-chunk-per-block layout."""
    if codec == "snappy":
        # the preamble varint IS the chunk's size; trust it over the hint
        size, _ = _uvarint(data, 0)
        pa = _pa_codec(codec)
        if pa is not None:
            return bytes(pa.decompress(data, size))
        return snappy_block_decompress(data)
    pa = _pa_codec(codec)
    if pa is not None:
        try:
            return bytes(pa.decompress(data, expected))
        except Exception:
            pass  # multi-chunk block: hint overshoots → pure-Python path
    return lz4_block_decompress(data)


# --------------------------------------------------- Hadoop stream framing


def hadoop_block_compress(
    data: bytes, codec: str, block_size: int = 256 * 1024
) -> bytes:
    """Compress ``data`` into Hadoop BlockCompressorStream framing
    (one chunk per block, like Hadoop's own compressors emit)."""
    if codec not in _SUPPORTED:
        raise ValueError(f"codec must be one of {_SUPPORTED}, got {codec!r}")
    out = bytearray()
    for i in range(0, len(data), block_size):
        block = data[i : i + block_size]
        chunk = _compress_chunk(block, codec)
        out += struct.pack(">i", len(block))
        out += struct.pack(">i", len(chunk))
        out += chunk
    return bytes(out)


def hadoop_block_decompress_iter(read, compressed_len: int, codec: str):
    """Yield decompressed pieces from a Hadoop block stream of
    ``compressed_len`` bytes, pulled via ``read(n) -> exactly-n bytes``.
    Memory stays bounded by one block (Hadoop default 256 KiB), so a
    multi-GB section streams. Raises ValueError on truncation."""
    if codec not in _SUPPORTED:
        raise ValueError(f"codec must be one of {_SUPPORTED}, got {codec!r}")
    consumed = 0

    def take(k: int) -> bytes:
        nonlocal consumed
        if consumed + k > compressed_len:
            raise ValueError(
                f"block stream truncated: need {k} bytes, "
                f"{compressed_len - consumed} left in section"
            )
        buf = read(k)
        if len(buf) != k:
            raise ValueError(f"short read: wanted {k} bytes, got {len(buf)}")
        consumed += k
        return buf

    while consumed < compressed_len:
        (block_len,) = struct.unpack(">i", take(4))
        if block_len < 0:
            raise ValueError(f"negative uncompressed block length {block_len}")
        produced = 0
        while produced < block_len:
            (chunk_len,) = struct.unpack(">i", take(4))
            if chunk_len <= 0:
                raise ValueError(f"bad compressed chunk length {chunk_len}")
            raw = _decompress_chunk(take(chunk_len), codec, block_len - produced)
            produced += len(raw)
            if produced > block_len:
                raise ValueError(
                    f"chunk inflated past its block: {produced} > {block_len}"
                )
            yield raw
