"""Link admission: extracted edges → deduped, robots-gated, scored
candidate frontier rows.

Covers the reference hooks links_extracted + filter_extracted_links +
update_score (frontera/strategy/__init__.py:~60-80, worker scoring path —
approximate cites, SURVEY.md §0) as two Dataset stages:

1. ``AdmitLinks`` (map_batches, vectorized): scheme filter, optional depth
   cutoff, URL enrichment (canonicalize/fp/host/partition), robots gate via
   the broadcast PolitenessIndex. Emits an ``allowed`` bool column instead
   of filtering, so one pass feeds BOTH the candidate stream and the
   per-partition filter counters (A1 partial-aggregation pattern).

2. ``aggregate_candidates`` (groupby fp64 — the one shuffle, keyed on the
   dedup key): per child URL pick the deterministic winner edge
   (min (depth, parent_fp64, url)) and compute the policy score — OPIC cash
   Σ parent_score/parent_outdeg over ALL edges (A3), else 1/(depth+1).

Output rows are FRONTIER-shaped with state=QUEUED, ready for the seen
filter. Skew note: the fp64 shuffle is uniform by construction (sha1), so
no salting is needed here; host skew is handled at the scheduler/politeness
layer where the skewed key (host) actually matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .. import schema as S
from ..config import CrawlConfig
from .enrich import enrich_urls


class AdmitLinks:
    def __init__(self, cfg: CrawlConfig, politeness_ref):
        self.num_partitions = cfg.num_partitions
        self.schemes = tuple(f"{s}://" for s in cfg.allowed_schemes)
        self.max_depth = cfg.max_depth
        self.obey_robots = cfg.obey_robots
        self.politeness_ref = politeness_ref
        self._pol = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return enrich_urls(batch, self.num_partitions).append_column(
                "allowed", pa.array([], pa.bool_())
            )
        batch = enrich_urls(batch, self.num_partitions)
        urls = batch["url"].to_pylist()
        ok = np.fromiter(
            (u.startswith(self.schemes) for u in urls), dtype=bool, count=len(urls)
        )
        if self.max_depth is not None:
            depths = batch["depth"].to_numpy(zero_copy_only=False)
            ok &= depths <= self.max_depth
        if self.obey_robots:
            if self._pol is None:
                self._pol = ray.get(self.politeness_ref)
            hosts = batch["host"].to_pylist()
            ok &= self._pol.allowed_mask(hosts, urls)
        return batch.append_column("allowed", pa.array(ok))


def _winner(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["depth", "parent_fp64", "url"], kind="mergesort")
    row = g.head(1).copy()
    row["opic_cash"] = (g["parent_score"] / g["parent_outdeg"].clip(lower=1)).sum()
    return row


def aggregate_candidates(admitted_ds, cfg: CrawlConfig):
    """groupby(fp64) dedup + score → FRONTIER-shaped QUEUED rows Dataset."""
    dedup = admitted_ds.groupby("fp64").map_groups(_winner, batch_format="pandas")

    policy = cfg.policy

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        depth = batch["depth"].to_numpy(zero_copy_only=False)
        if policy == "opic":
            score = batch["opic_cash"].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            score = 1.0 / (depth.astype(np.float64) + 1.0)
        return pa.table(
            {
                "url": batch["url"],
                "fp64": batch["fp64"],
                "fp_hex": batch["fp_hex"],
                "host": batch["host"],
                "host_hash": batch["host_hash"],
                "partition": batch["partition"],
                "state": pa.array(np.full(n, S.QUEUED, dtype=np.uint8)),
                "score": pa.array(score, pa.float64()),
                "depth": batch["depth"],
                "discovered_epoch": batch["discovered_epoch"],
                "fetched_epoch": pa.array(np.full(n, -1, dtype=np.int32)),
                "status_code": pa.array(np.full(n, -1, dtype=np.int16)),
                "parent_fp64": batch["parent_fp64"],
            }
        )

    return dedup.map_batches(finish, batch_format="pyarrow")


def seeds_to_frontier(seeds: pa.Table, cfg: CrawlConfig) -> pa.Table:
    """Driver-side (seed lists are small): seed rows → FRONTIER QUEUED rows.
    Reference: strategy.read_seeds → schedule(request, score)
    (frontera/strategy/__init__.py:~30, approx)."""
    t = enrich_urls(seeds, cfg.num_partitions)
    n = t.num_rows
    score = (
        t["score"]
        if "score" in t.schema.names
        else pa.array(np.ones(n, dtype=np.float64))
    )
    return pa.table(
        {
            "url": t["url"],
            "fp64": t["fp64"],
            "fp_hex": t["fp_hex"],
            "host": t["host"],
            "host_hash": t["host_hash"],
            "partition": t["partition"],
            "state": pa.array(np.full(n, S.QUEUED, dtype=np.uint8)),
            "score": score,
            "depth": pa.array(np.zeros(n, dtype=np.int32)),
            "discovered_epoch": pa.array(np.full(n, -1, dtype=np.int32)),
            "fetched_epoch": pa.array(np.full(n, -1, dtype=np.int32)),
            "status_code": pa.array(np.full(n, -1, dtype=np.int16)),
            "parent_fp64": pa.array(np.zeros(n, dtype=np.uint64)),
        }
    ).cast(S.FRONTIER)
