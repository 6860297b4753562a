"""Fixed Arrow schemas for every logical table (SURVEY.md §1.4).

The reference keeps its data model implicit (Python dicts / key-value rows;
reference: frontera/core/models.py:~15-90, contrib/backends/sqlalchemy/
models.py:~1-120 — approximate cites, see SURVEY.md §0). Here every table has
one declared pyarrow schema and every map_batches stage states its output
schema against these.
"""

from __future__ import annotations

import pyarrow as pa

# --- per-URL lifecycle states (reference: frontera/core/components.py:~60-80)
NOT_CRAWLED = 0
QUEUED = 1
CRAWLED = 2
ERROR = 3

STATE_NAMES = {NOT_CRAWLED: "NOT_CRAWLED", QUEUED: "QUEUED", CRAWLED: "CRAWLED", ERROR: "ERROR"}

# --- pages: the input table, EXACTLY the BASELINE.json input_hint shape.
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# --- frontier: one row per known URL; replaces the reference's three
# persisted tables (metadata + states + queue, SURVEY.md §1.2).
FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),          # canonical URL
        pa.field("fp64", pa.uint64()),         # first 8 bytes of sha1(url) — hot-path key
        pa.field("fp_hex", pa.string()),       # full sha1 hex — parity boundary only
        pa.field("host", pa.string()),
        pa.field("host_hash", pa.int64()),     # signed crc32(host) (partition parity!)
        pa.field("partition", pa.int32()),     # host_hash % num_partitions (python modulo)
        pa.field("state", pa.uint8()),
        pa.field("score", pa.float64()),
        pa.field("depth", pa.int32()),
        pa.field("discovered_epoch", pa.int32()),
        pa.field("fetched_epoch", pa.int32()),  # -1 until fetched
        pa.field("status_code", pa.int16()),    # -1 until fetched; 200 ok, 404 miss
        pa.field("parent_fp64", pa.uint64()),   # lineage; 0 for seeds
    ]
)

# --- scheduled batch: frontier subset + rank assigned by the scheduler.
SCHEDULED = FRONTIER.append(pa.field("budget_rank", pa.int32()))

# --- results/out: fetched pages; `text` carried byte-identical (invariant).
OUT = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("fp64", pa.uint64()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("n_links", pa.int32()),
        pa.field("fetched_epoch", pa.int32()),
    ]
)

# --- counters: per epoch × partition metrics (north rule lineage/metrics).
COUNTERS = pa.schema(
    [
        pa.field("epoch", pa.int32()),
        pa.field("partition", pa.int32()),
        pa.field("metric", pa.string()),
        pa.field("value", pa.int64()),
    ]
)

# --- extracted links (intermediate): one row per (parent, child) edge.
LINKS = pa.schema(
    [
        pa.field("url", pa.string()),           # child canonical URL
        pa.field("parent_fp64", pa.uint64()),
        pa.field("parent_score", pa.float64()),
        pa.field("parent_outdeg", pa.int32()),  # outdegree of parent (for OPIC cash split)
        pa.field("depth", pa.int32()),          # child depth = parent depth + 1
        pa.field("discovered_epoch", pa.int32()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
