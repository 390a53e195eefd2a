"""Deterministic `hdfs oiv -p XML`-shaped fixture generator.

Emits the PBImageXmlWriter element layout (INodeSection inodes followed by
the INodeDirectorySection parent/child edges) for a synthetic namespace
derived from closed-form formulas — so a SQL oracle can reproduce every
row from range() without reading the XML. Used by the OIV-XML reader
tests and the driver-gate `oiv_xml_roundtrip` query.

Namespace shape: root (id ROOT_ID) → `n_dirs` directories → each holding
`files_per_dir` files. For file j of dir d, with i = d*files_per_dir + j:

    id          = ROOT_ID + 1 + n_dirs + i
    name        = f"f{d}_{j}"
    replication = j % 3 + 1
    mtime       = BASE_MS + i * 1000;  atime = mtime + 500
    blocks      = [1024*(j+1) + d] plus an extra 512-byte block when j%4==0
    permission  = "u{j%3}:g{j%2}:rw-r--r--"  (bits 420)
"""

from __future__ import annotations

import os

ROOT_ID = 16385
BASE_MS = 1_700_000_000_000
BLOCK = 134_217_728


def write_oiv_xml(path: str, n_dirs: int = 4, files_per_dir: int = 25) -> str:
    """Write the fixture image as one XML file; returns the file path."""
    lines = ["<?xml version=\"1.0\"?>", "<fsimage>", "<INodeSection>"]
    lines.append(
        f"<inode><id>{ROOT_ID}</id><type>DIRECTORY</type><name></name>"
        f"<mtime>{BASE_MS}</mtime><permission>hdfs:supergroup:rwxr-xr-x</permission>"
        "<nsquota>9000</nsquota><dsquota>-1</dsquota></inode>"
    )
    for d in range(n_dirs):
        lines.append(
            f"<inode><id>{ROOT_ID + 1 + d}</id><type>DIRECTORY</type>"
            f"<name>dir{d}</name><mtime>{BASE_MS + d}</mtime>"
            "<permission>hdfs:supergroup:rwxr-xr-x</permission>"
            "<nsquota>-1</nsquota><dsquota>-1</dsquota></inode>"
        )
    for d in range(n_dirs):
        for j in range(files_per_dir):
            i = d * files_per_dir + j
            fid = ROOT_ID + 1 + n_dirs + i
            mtime = BASE_MS + i * 1000
            blocks = f"<block><id>{10_000 + i}</id><genstamp>1001</genstamp><numBytes>{1024 * (j + 1) + d}</numBytes></block>"
            if j % 4 == 0:
                blocks += f"<block><id>{20_000 + i}</id><genstamp>1002</genstamp><numBytes>512</numBytes></block>"
            lines.append(
                f"<inode><id>{fid}</id><type>FILE</type><name>f{d}_{j}</name>"
                f"<replication>{j % 3 + 1}</replication>"
                f"<mtime>{mtime}</mtime><atime>{mtime + 500}</atime>"
                f"<perferredBlockSize>{BLOCK}</perferredBlockSize>"
                f"<permission>u{j % 3}:g{j % 2}:rw-r--r--</permission>"
                f"<blocks>{blocks}</blocks></inode>"
            )
    lines.append("</INodeSection>")
    lines.append("<INodeDirectorySection>")
    root_children = "".join(f"<child>{ROOT_ID + 1 + d}</child>" for d in range(n_dirs))
    lines.append(f"<directory><parent>{ROOT_ID}</parent>{root_children}</directory>")
    for d in range(n_dirs):
        kids = "".join(
            f"<child>{ROOT_ID + 1 + n_dirs + d * files_per_dir + j}</child>"
            for j in range(files_per_dir)
        )
        lines.append(f"<directory><parent>{ROOT_ID + 1 + d}</parent>{kids}</directory>")
    lines.append("</INodeDirectorySection>")
    lines.append("</fsimage>")
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "fsimage.xml")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    return out


def oracle_sql(n_dirs: int = 4, files_per_dir: int = 25) -> str:
    """DuckDB SQL reproducing the FILE rows of the fixture namespace in
    the reader's output schema (the roundtrip contract)."""
    return f"""
        SELECT {ROOT_ID} + 1 + {n_dirs} + i AS id,
               'file' AS type,
               '/dir' || CAST(i // {files_per_dir} AS VARCHAR) || '/f'
                 || CAST(i // {files_per_dir} AS VARCHAR) || '_'
                 || CAST(i % {files_per_dir} AS VARCHAR) AS path,
               'f' || CAST(i // {files_per_dir} AS VARCHAR) || '_'
                 || CAST(i % {files_per_dir} AS VARCHAR) AS name,
               'u' || CAST((i % {files_per_dir}) % 3 AS VARCHAR) AS "user",
               'g' || CAST((i % {files_per_dir}) % 2 AS VARCHAR) AS "group",
               420 AS permission,
               {BASE_MS} + i * 1000 + 500 AS "accessTime",
               {BASE_MS} + i * 1000 AS "modTime",
               CAST(1024 * ((i % {files_per_dir}) + 1) + (i // {files_per_dir})
                    + CASE WHEN (i % {files_per_dir}) % 4 = 0 THEN 512 ELSE 0 END
                    AS BIGINT) AS "fileSize",
               CAST((i % {files_per_dir}) % 3 + 1 AS INT) AS "fileReplica",
               CAST(CASE WHEN (i % {files_per_dir}) % 4 = 0 THEN 2 ELSE 1 END AS INT)
                 AS "numBlocks"
        FROM range({n_dirs * files_per_dir}) t(i)
    """
