"""Generic resumable partitioned-parquet sink (task brief: "write
partitioned Parquet so a failed run can skip finished partitions; never
one giant file").

Layout: ``out_dir/part-<value>/batch-<digest>.parquet`` — one directory
per partition value (dash-named, NOT ``key=value``: hive inference on
read-back injects phantom columns), many files per partition (one per
input block, so the write streams and never concentrates a partition on
one task). Retry safety comes from CONTENT-DERIVED file names: a Ray
task retry rewrites the same file instead of adding a duplicate part
(same discipline as the crawl's WriteOut, pipelines/crawl.py). Job-level
resumability comes from a manifest written LAST (``_SUCCESS.json`` with
per-partition row counts): ``write_partitioned(..., skip_existing=True)``
returns immediately when a complete manifest exists, and a crashed run —
no manifest — simply rewrites (idempotent file names ⇒ no duplicates).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST = "_SUCCESS.json"


def _part_dir(out_dir: str, value) -> str:
    # '_' is the escape prefix, so it must NOT be in the pass-through set:
    # keeping it verbatim would map the distinct values 'a/b' and literal
    # 'a_2fb' to the same directory (non-injective encoding → rows from
    # two partitions silently mix in one dir). '_' itself encodes as '_5f'.
    s = str(value)
    safe = "".join(c if c.isalnum() or c in "-." else f"_{ord(c):02x}" for c in s)
    return os.path.join(out_dir, f"part-{safe}")


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    skip_existing: bool = True,
) -> dict:
    """Write a Dataset as partition-value directories of parquet files.

    Returns the manifest dict: {"partitions": {value: rows}, "rows": N}.
    The write is one streaming map_batches pass (each batch splits by
    partition value, writes its slices, and emits per-partition count
    partials); nothing is collected to the driver but counts.
    """
    man_path = os.path.join(out_dir, _MANIFEST)
    if skip_existing and os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        vals, counts, digests = [], [], []
        if t.num_rows:
            col = t[partition_col].to_numpy(zero_copy_only=False)
            order = np.argsort(col, kind="stable")
            sorted_col = col[order]
            bounds = np.flatnonzero(
                np.r_[True, sorted_col[1:] != sorted_col[:-1]]
            ).tolist() + [len(sorted_col)]
            for i in range(len(bounds) - 1):
                idx = order[bounds[i] : bounds[i + 1]]
                sub = t.take(pa.array(np.sort(idx)))
                v = sorted_col[bounds[i]]
                d = _part_dir(out_dir, v)
                os.makedirs(d, exist_ok=True)
                # content-derived name: a retried task re-produces the
                # identical slice bytes, so it rewrites the same file
                # instead of adding a duplicate part
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, sub.schema) as w:
                    w.write_table(sub)
                digest = hashlib.md5(sink.getvalue()).hexdigest()[:20]
                pq.write_table(sub, os.path.join(d, f"batch-{digest}.parquet"))
                vals.append(str(v))
                counts.append(len(idx))
                digests.append(digest)
        return pa.table(
            {
                "value": pa.array(vals, pa.string()),
                "rows": pa.array(counts, pa.int64()),
                "digest": pa.array(digests, pa.string()),
            }
        )

    parts = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    # Two different input blocks with byte-identical rows produce the same
    # content-derived file name, so the second write overwrites the first:
    # identical duplicate blocks are COLLAPSED on disk (documented
    # behavior — the flip side of retry idempotence). Count unique
    # (value, digest) so manifest['rows'] equals what is actually stored.
    if len(parts):
        parts = parts.drop_duplicates(["value", "digest"])
    agg = parts.groupby("value")["rows"].sum() if len(parts) else {}
    manifest = {
        "partitions": {str(k): int(v) for k, v in dict(agg).items()},
        "rows": int(sum(dict(agg).values())) if len(parts) else 0,
        "partition_col": partition_col,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)  # manifest-last: a crash before this line
    # leaves no _SUCCESS, and the rerun's identical file names make the
    # rewrite idempotent
    return manifest
