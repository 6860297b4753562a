"""Seen-filter stage: admit only never-seen URLs (the J3 anti-join +
J4 queue-dedup of SURVEY.md §2.4, backed by the sharded seen-set actors).

The candidate table arrives already deduped per fp64 (one row per child,
deterministic winner — stages/links.py), so shard calls are idempotent
test-and-set: each batch routes its rows to the owning shard
(``partition % K``, i.e. the host partitioner) and keeps rows the shard
reports as new.

This runs as a map_batches stage whose tasks call shard actors with one
numpy array per (batch × shard) — vectorized round-trips, no per-URL RPC.
Shard actors serialize concurrent calls, and because every fp64 appears in
exactly one row, arrival order across batches cannot change the admitted
set (determinism under parallelism, hard part #1 SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.seen import SeenShard


def make_seen_pool(
    num_shards: int,
    capacity: int,
    spill_threshold: int = 1 << 22,
    spill_dir: str | None = None,
    max_resident_keys: int = 1 << 26,
) -> list:
    """K seen-shard actors, one per host partition."""
    RemoteShard = ray.remote(SeenShard)
    return [
        RemoteShard.options(max_restarts=1).remote(
            i, capacity, spill_threshold, spill_dir, max_resident_keys
        )
        for i in range(num_shards)
    ]


class SeenFilterStage:
    """map_batches callable (stateless task holding actor handles)."""

    def __init__(self, shard_handles: list):
        self.shards = shard_handles

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        parts = batch["partition"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps = batch["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shard_of = parts % len(self.shards)
        keep = np.zeros(n, dtype=bool)
        futures = {}
        for s in np.unique(shard_of):
            idx = np.nonzero(shard_of == s)[0]
            futures[int(s)] = (idx, self.shards[int(s)].add_if_new.remote(fps[idx]))
        for s, (idx, fut) in futures.items():
            keep[idx] = ray.get(fut)
        return batch.filter(pa.array(keep))


def seed_seen(shard_handles: list, fps: np.ndarray, partitions: np.ndarray) -> np.ndarray:
    """Driver-side helper: mark an array of fps seen; returns the new-mask."""
    k = len(shard_handles)
    shard_of = partitions.astype(np.int64) % k
    keep = np.zeros(len(fps), dtype=bool)
    futs = []
    for s in range(k):
        idx = np.nonzero(shard_of == s)[0]
        if len(idx):
            futs.append((idx, shard_handles[s].add_if_new.remote(fps[idx].astype(np.uint64))))
    for idx, f in futs:
        keep[idx] = ray.get(f)
    return keep


def dump_shards(shard_handles: list) -> list[bytes]:
    return ray.get([s.dump.remote() for s in shard_handles])


def restore_shards(shard_handles: list, blobs: list[bytes]) -> None:
    ray.get([s.load.remote(b) for s, b in zip(shard_handles, blobs)])
