"""Seed loaders (SURVEY.md §2.1 S1/S2: reference read_seeds +
file/S3 seed middlewares — frontera/strategy/__init__.py:~30,
contrib/middlewares/seeds/{file,s3}.py, approximate cites).

Accepted formats:
  *.parquet — columns (url [, score])
  *.txt / anything else — one seed per line: ``url`` or ``url<TAB>score``
    (or space-separated); blank lines and ``#`` comments skipped.

Remote seed lists (S2) flow through ``pyarrow.fs.FileSystem.from_uri`` —
the SAME dispatch that returns an S3FileSystem for ``s3://bucket/key``
returns a LocalFileSystem for ``file:///...``, so the round-5 ``file://``
test drives the identical code path the sandbox can't reach over the
network (no credentials/endpoints exist here; an S3 URI would fail only
at connect time, not in this plumbing).

Seed lists are driver-held here (they are orders of magnitude smaller than
the frontier); for 10^8+ seed files the same parse runs as
``ray.data.read_text(...).map_batches(parse)`` feeding the enrich stage
distributed — the column contract (url, score) is identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _resolve_fs(path: str):
    """URI → (FileSystem, path-within-fs). ``s3://`` / ``file://`` / any
    scheme pyarrow.fs understands; bare paths use the local filesystem."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def read_seed_table(path: str) -> pa.Table:
    filesystem, p = _resolve_fs(path)
    if p.endswith(".parquet"):
        t = pq.read_table(p, filesystem=filesystem)
        if "score" not in t.schema.names:
            t = t.append_column(
                "score", pa.array([1.0] * t.num_rows, pa.float64())
            )
        return t.select(["url", "score"])
    urls: list[str] = []
    scores: list[float] = []
    with filesystem.open_input_stream(p) as f:
        text = f.read().decode()
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t") if "\t" in line else line.split()
        urls.append(parts[0])
        scores.append(float(parts[1]) if len(parts) > 1 else 1.0)
    return pa.table(
        {"url": pa.array(urls, pa.string()), "score": pa.array(scores, pa.float64())}
    )
