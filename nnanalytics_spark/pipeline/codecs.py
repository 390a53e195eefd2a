"""Pure-Python media codecs for the multimodal pipeline.

Real (not stubbed) encode/decode for two modalities that need only the
standard library + numpy, so the container's lack of PIL/ffmpeg doesn't
force fake kernels:

- **WAV audio**: RIFF container, 8-bit unsigned mono PCM. The decoder
  struct-parses the chunk stream (it does NOT reuse the `wave` module the
  encoder uses, so round-trip tests actually cross two implementations).
- **PNG image**: 8-bit grayscale. The decoder parses the chunk stream,
  verifies every chunk CRC, inflates the IDAT stream with zlib and undoes
  all five scanline filters (None/Sub/Up/Average/Paeth per the PNG spec,
  RFC 2083 §6). The encoder can emit any filter type per row, so tests
  exercise every unfilter branch.

- **AVI video**: RIFF container, uncompressed 24-bit DIB frames. As with
  WAV/PNG, the decoder is an independent struct-walk of the chunk stream
  (no helpers shared with the encoder), so round-trips cross two
  implementations.

These kernels run inside Arrow-batched mapInPandas workers
(multimodal.py): payload bytes never shuffle, outputs are narrow typed
columns — the 100 TB shape is unchanged, only the kernel is now real.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF / PCM)
# ---------------------------------------------------------------------------

WAV_RATE = 8000


def encode_wav(data: bytes, sample_rate: int = WAV_RATE) -> bytes:
    """Wrap raw bytes as 8-bit unsigned mono PCM WAV (stdlib `wave`)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(data)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Struct-parse a RIFF/WAVE chunk stream.

    Returns sample_rate, n_channels, bits_per_sample, n_samples,
    duration_ms and the raw PCM bytes. Raises ValueError on a malformed
    container (wrong magic, truncated chunk, missing fmt/data)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk %r" % cid)
        if cid == b"fmt ":
            audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_format != 1:  # PCM
                raise ValueError("unsupported WAV format %d" % audio_format)
            fmt = (n_channels, sample_rate, block_align, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n_channels, sample_rate, block_align, bits = fmt
    if not sample_rate:
        # malformed-container contract: ValueError (which callers catch),
        # never ZeroDivisionError from duration_ms below
        raise ValueError("fmt chunk has zero sample rate")
    n_samples = len(data) // max(block_align, 1)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
        "pcm": data,
    }


def pcm_rms(pcm_bytes: "np.ndarray", n_segments: int = 8) -> list[float]:
    """Per-segment RMS of a decoded uint8 PCM array (centered samples) —
    the kernel behind wav_features, exposed so single-decode callers
    (multimodal.extract_features) can reuse an already-decoded array."""
    pcm = pcm_bytes.astype(np.float64) - 128.0
    if pcm.size == 0:
        return [0.0] * n_segments
    out = []
    for seg in np.array_split(pcm, n_segments):
        out.append(float(np.sqrt(np.mean(seg * seg)) / 128.0) if seg.size else 0.0)
    return out


def wav_features(payload: bytes, n_segments: int = 8) -> list[float]:
    """Real audio features: per-segment RMS of the decoded PCM signal
    (centered 8-bit samples), vectorized with numpy."""
    return pcm_rms(
        np.frombuffer(decode_wav(payload)["pcm"], dtype=np.uint8), n_segments
    )


# ---------------------------------------------------------------------------
# PNG (8-bit grayscale)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_WIDTH = 64


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(data: bytes, width: int = PNG_WIDTH, filters: tuple[int, ...] = (0, 1, 2, 3, 4)) -> bytes:
    """Encode raw bytes as an 8-bit grayscale PNG, one byte per pixel,
    zero-padded to a full last row. Rows cycle through `filters` so a
    decoder must implement every filter type to round-trip."""
    if width <= 0:
        raise ValueError("width must be positive")
    height = max((len(data) + width - 1) // width, 1)
    px = np.zeros((height, width), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    px.reshape(-1)[: flat.size] = flat
    raw = bytearray()
    prev = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        row = px[y]
        f = filters[y % len(filters)]
        left = np.concatenate(([0], row[:-1])).astype(np.int32)
        up = prev.astype(np.int32)
        ul = np.concatenate(([0], prev[:-1])).astype(np.int32)
        cur = row.astype(np.int32)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur - (left + up) // 2
        elif f == 4:
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, ul)],
                dtype=np.int32,
            )
            enc = cur - pred
        else:
            raise ValueError("unknown filter %d" % f)
        raw.append(f)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Parse + inflate + unfilter an 8-bit grayscale PNG.

    Verifies every chunk CRC; supports all five scanline filters. Returns
    width, height, bit_depth and the reconstructed pixel array
    (np.uint8, shape (height, width)). Raises ValueError on corruption."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(PNG_SIG), None, bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk %r" % ctype)
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError("CRC mismatch in %r" % ctype)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced grayscale supported")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("scanline stream size mismatch")
    px = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        f = raw[y * stride]
        line = np.frombuffer(raw, dtype=np.uint8, count=width, offset=y * stride + 1).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prev) % 256
        elif f in (1, 3, 4):
            rec = np.zeros(width, dtype=np.int32)
            for x in range(width):
                a = rec[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError("unknown filter %d" % f)
        px[y] = rec.astype(np.uint8)
        prev = rec
    return {"width": width, "height": height, "bit_depth": bit_depth, "pixels": px}


def intensity_hist(px: "np.ndarray", n_buckets: int = 8) -> list[float]:
    """Normalized n-bin intensity histogram of a flat uint8 pixel array —
    the kernel behind png_features/avi_features, exposed for
    single-decode callers."""
    if px.size == 0:
        return [0.0] * n_buckets
    hist = np.bincount(px >> 5, minlength=n_buckets)[:n_buckets]
    return (hist / px.size).astype(np.float64).tolist()


def png_features(payload: bytes, n_buckets: int = 8) -> list[float]:
    """Real image features: normalized `n_buckets`-bin intensity histogram
    of the decoded pixels."""
    return intensity_hist(decode_png(payload)["pixels"].reshape(-1), n_buckets)


# ---------------------------------------------------------------------------
# AVI video (RIFF / uncompressed 24-bit DIB frames)
# ---------------------------------------------------------------------------

AVI_WIDTH = 16
AVI_HEIGHT = 8
AVI_FPS = 5


def encode_avi(
    data: bytes, width: int = AVI_WIDTH, height: int = AVI_HEIGHT, fps: int = AVI_FPS
) -> bytes:
    """Wrap raw bytes as an uncompressed AVI: grayscale values become
    24-bit BI_RGB DIB frames (each byte replicated to B=G=R), width*height
    bytes per frame, zero-padded last frame, rows stored bottom-up per the
    DIB convention. Standard RIFF 'AVI ' layout: LIST hdrl (avih + LIST
    strl (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) + LIST movi with
    one '00db' chunk per frame. width*3 must stay 4-byte aligned (the DIB
    row-pad rule); the default 16 is."""
    if (width * 3) % 4:
        raise ValueError("width*3 must be 4-byte aligned")
    px = width * height
    n_frames = max((len(data) + px - 1) // px, 1)
    padded = data.ljust(n_frames * px, b"\x00")

    frames = []
    for k in range(n_frames):
        grey = padded[k * px : (k + 1) * px]
        rows = [grey[r * width : (r + 1) * width] for r in range(height)]
        bgr = b"".join(
            b"".join(bytes((v, v, v)) for v in row) for row in reversed(rows)
        )
        frames.append(bgr)
    frame_bytes = len(frames[0])

    def chunk(cid: bytes, body: bytes) -> bytes:
        out = struct.pack("<4sI", cid, len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no idx1 chunk is written, so AVIF_HASINDEX must be off
        n_frames,
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        width,
        height,
    ) + struct.pack("<4I", 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII",
        b"vids",
        b"DIB ",
        0,  # flags
        0, 0,  # priority, language
        0,  # initial frames
        1,  # scale
        fps,  # rate (fps = rate/scale)
        0,  # start
        n_frames,  # length
        frame_bytes,  # suggested buffer
        0,  # quality
        0,  # sample size
    ) + struct.pack("<4H", 0, 0, width, height)
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0,  # biSize..biCompression (BI_RGB)
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi(payload: bytes) -> dict:
    """Struct-parse a RIFF/AVI chunk stream — independent of the encoder
    (no shared helpers), mirroring decode_wav's cross-implementation
    round-trip guarantee. Walks hdrl for avih/strh/strf, collects '00db'/
    '00dc' frames from movi, validates frame sizes against the parsed
    geometry, and un-flips the bottom-up DIB rows back to top-down
    grayscale arrays. Raises ValueError on malformed containers."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    width = height = n_frames_hdr = None
    fps = bits = compression = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, n_frames_hdr, fps, bits, compression
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, pos)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated chunk %r" % cid)
            if cid == b"LIST":
                ltype = buf[body_start : body_start + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_start + size)
            # header structs validate the chunk's DECLARED size before
            # unpack_from: a short chunk must raise ValueError (the
            # malformed-payload contract), not struct.error from reading
            # past the declared body — or worse, silently parse the next
            # chunk's bytes as header fields.
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("short avih chunk")
                (usec, _mbps, _pad, _flags, total, _init, _streams, _buf,
                 w, h) = struct.unpack_from("<10I", buf, body_start)
                width, height, n_frames_hdr = w, h, total
                if usec:
                    fps = round(1_000_000 / usec)
            elif cid == b"strh":
                if size < 28:
                    raise ValueError("short strh chunk")
                fcc = buf[body_start : body_start + 4]
                if fcc == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, body_start + 20)
                    if scale:
                        fps = rate // scale
            elif cid == b"strf":
                if size < 20:
                    raise ValueError("short strf chunk")
                (_sz, _w, _h, _planes, bc, comp) = struct.unpack_from(
                    "<IiiHHI", buf, body_start
                )
                bits, compression = bc, comp
            elif cid in (b"00db", b"00dc"):
                frames.append(buf[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(payload, 12, len(payload))
    # `not fps` (not just None) — a crafted strh with rate//scale == 0
    # must fail as ValueError here, not ZeroDivisionError at duration_ms
    # below: callers' malformed-payload fallback catches only ValueError.
    if width is None or not fps:
        raise ValueError("missing or degenerate avih/strh header")
    if not width or not height:
        raise ValueError("degenerate geometry %sx%s" % (width, height))
    if compression not in (0, None):
        raise ValueError("unsupported AVI compression %r" % compression)
    if bits not in (24, None):
        raise ValueError("unsupported bit depth %r" % bits)
    expect = width * height * 3
    grey_frames = []
    for f in frames:
        if len(f) != expect:
            raise ValueError("frame size %d != %d" % (len(f), expect))
        arr = np.frombuffer(f, dtype=np.uint8).reshape(height, width, 3)
        grey_frames.append(arr[::-1, :, 0].copy())  # un-flip bottom-up rows
    n_frames = len(grey_frames)
    if n_frames_hdr is not None and n_frames_hdr != n_frames:
        raise ValueError("header frame count %s != %d" % (n_frames_hdr, n_frames))
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // fps,
        "frames": grey_frames,
    }


def avi_features(payload: bytes, n_buckets: int = 8) -> list[float]:
    """Real video features: normalized intensity histogram over every
    decoded frame's pixels (sums to 1), vectorized with numpy."""
    meta = decode_avi(payload)
    px = np.concatenate([f.ravel() for f in meta["frames"]])
    return intensity_hist(px, n_buckets)


def content_summary(payload: bytes | None, kind: str) -> tuple[int, int]:
    """(n_content, content_sum) over the DECODED content bytes — pixels
    for PNG, PCM bytes for WAV, grayscale frame pixels for AVI. Unlike
    the container crc32 (which depends on the encoder's zlib output),
    both numbers are pure functions of the decoded data, so a
    deterministic payload pipeline can predict them externally — the
    content-level integrity contract. Undecodable/absent payloads return
    (0, -1): corruption is distinguishable from legitimately empty
    content. The sum is exact (decoded media here is far below the
    2^63 / 255 byte count where a plain sum could wrap)."""
    if payload is None:
        return 0, -1
    import zlib

    try:
        if kind == "image":
            px = decode_png(payload)["pixels"]
            return int(px.size), int(px.astype(np.int64).sum())
        if kind == "audio":
            pcm = np.frombuffer(decode_wav(payload)["pcm"], dtype=np.uint8)
            return int(pcm.size), int(pcm.astype(np.int64).sum())
        if kind == "video":
            frames = decode_avi(payload)["frames"]
            n = sum(f.size for f in frames)
            return int(n), int(sum(int(f.astype(np.int64).sum()) for f in frames))
    # corrupt containers surface as struct.error (truncated headers/CRC
    # fields) or zlib.error (bad IDAT deflate) as readily as ValueError —
    # all three mean "undecodable", the documented (0, -1) sentinel
    except (ValueError, struct.error, zlib.error):
        return 0, -1
    return 0, -1
