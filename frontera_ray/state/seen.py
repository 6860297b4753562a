"""Sharded URL-seen set — the engine's replacement for the reference's
States store (reference: States iface frontera/core/components.py:~200-260,
MemoryStates / SQLAlchemy / HBaseState backends — approximate cites,
SURVEY.md §0 — where fingerprint→state rows are the dedup mechanism).

Design (north rule: "sharded cuckoo-filter URL-seen set (bloom fallback per
partition) … partitioned by hash(host)"):

* K shard actors, shard = ``signed_crc32(host) % K`` — the SAME partitioner
  the scheduler and politeness stages use, so one key co-locates all
  per-host state (reference parity: Crc32NamePartitioner on the spider feed).
* Each shard: a **cuckoo filter** as the approximate front (answers the
  "definitely new" fast path with one vectorized probe), an **exact uint64
  set** as the authoritative store behind it (confirms filter positives →
  zero false drops, required for seen-set parity with the reference), and a
  **bloom filter fallback** that takes over inserts if the cuckoo filter
  saturates.
* All calls are batch-vectorized; an actor round-trip carries one numpy
  array per shard per epoch, not per URL.
* ``dump()/restore()`` are byte-stable → the whole seen-set checkpoints to
  one blob per shard per epoch and the crawl resumes exactly (north rule).

Scale notes (10^10 URLs): the exact set is the memory ceiling — at K=256
shards each holds ~40M keys ≈ 320 MB as a numpy array, which fits; past
that, shards spill the exact store to sorted parquet runs and the cuckoo
filter (0.01% FP) gates how often the spill is consulted. The filter itself
is 2 bytes/key. Actor restart recovers from the last checkpoint blob
(idempotent epoch replay re-adds at most one epoch of keys).
"""

from __future__ import annotations

import struct

import numpy as np

from .cuckoo import CuckooFilter
from .bloom import BloomFilter

_MAGIC = b"SEEN"


class SeenShard:
    """One shard of the URL-seen set. Plain class; wrapped in ray.remote by
    the pipeline (so tests can exercise it without a cluster)."""

    def __init__(
        self, shard_id: int, capacity: int = 1 << 20, spill_threshold: int = 1 << 22
    ):
        self.shard_id = shard_id
        self.capacity = capacity
        self.cuckoo = CuckooFilter(capacity, seed=shard_id)
        self.bloom: BloomFilter | None = None
        # authoritative store = hot set + frozen sorted runs (8 B/key vs
        # ~60 B/key for set entries — the 10^10-scale memory path; runs are
        # disjoint by construction since membership is checked before add)
        self.exact: set[int] = set()
        self.runs: list[np.ndarray] = []
        self.spill_threshold = spill_threshold

    # -- frozen-run helpers ---------------------------------------------
    def _runs_contains(self, fps: np.ndarray) -> np.ndarray:
        out = np.zeros(len(fps), dtype=bool)
        for run in self.runs:
            idx = np.minimum(np.searchsorted(run, fps), len(run) - 1)
            out |= run[idx] == fps
        return out

    def _maybe_spill(self) -> None:
        if len(self.exact) <= self.spill_threshold:
            return
        arr = np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))
        arr.sort()
        self.runs.append(arr)
        self.exact = set()
        if len(self.runs) > 4:  # bound probe cost: compact to one run
            merged = np.concatenate(self.runs)
            merged.sort()
            self.runs = [merged]

    # -- core op: test-and-set, vectorized ------------------------------
    def add_if_new(self, fps: np.ndarray) -> np.ndarray:
        """For each fingerprint: True if it was NOT seen before (and mark it
        seen). Duplicates *within* the batch: first occurrence wins.

        Exactness: the cuckoo/bloom filters short-circuit only the negative
        path; any filter hit is confirmed against the exact set, so the
        result has neither false drops nor false admits.
        """
        fps = np.asarray(fps, dtype=np.uint64)
        n = len(fps)
        if n == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.cuckoo.contains_batch(fps)
        if self.bloom is not None:
            maybe |= self.bloom.contains_batch(fps)
        new = np.zeros(n, dtype=bool)
        exact = self.exact
        run_hit = self._runs_contains(fps) if self.runs else None
        # definitely-new fast path still needs in-batch dedup
        batch_seen: set[int] = set()
        for i in range(n):
            k = int(fps[i])
            if maybe[i]:
                if k in exact or (run_hit is not None and run_hit[i]):
                    continue
            elif k in batch_seen:
                continue
            # new key
            new[i] = True
            batch_seen.add(k)
            exact.add(k)
        if batch_seen:
            arr = np.fromiter(batch_seen, dtype=np.uint64, count=len(batch_seen))
            # cuckoo until capacity; once full, freeze it and route new keys
            # to the bloom fallback (north rule: bloom fallback per partition)
            if self.bloom is None and self.cuckoo.count + len(arr) <= self.capacity:
                self.cuckoo.add_batch(arr)
            else:
                if self.bloom is None:
                    self.bloom = BloomFilter(self.capacity * 4)
                self.bloom.add_batch(arr)
        self._maybe_spill()
        return new

    # -- epoch-synchronous candidate resolution (offer/resolve protocol) --
    #
    # Replaces a per-epoch groupby(fp64) shuffle: admission candidates are
    # routed to their owning shard (same partitioner as everything else),
    # the shard accumulates winner_key-min + OPIC-cash-sum per unseen fp
    # (order-independent ⇒ deterministic under any parallelism), and
    # resolve() admits winners, writes the shard's QUEUED-delta parquet
    # itself (per-partition layout, nothing returns to the driver but
    # counts), and marks the fps seen. Mirrors the reference's strategy
    # worker owning the state cache (frontera/worker/strategy.py, approx
    # cite — SURVEY.md §0).

    def begin_epoch(self, epoch: int, policy: str, num_partitions: int) -> None:
        self.pending: dict[int, tuple[str, float]] = {}
        self._epoch = epoch
        self._policy = policy
        self._np = num_partitions

    def offer(self, fps: np.ndarray, keys: list[str], cash: np.ndarray) -> int:
        """Accumulate candidate edges for unseen fps; returns #accepted."""
        pending = self.pending
        exact = self.exact
        fps = np.asarray(fps, dtype=np.uint64)
        run_hit = self._runs_contains(fps) if self.runs else None
        n = 0
        for i in range(len(fps)):
            fp = int(fps[i])
            if fp in exact or (run_hit is not None and run_hit[i]):
                continue
            n += 1
            cur = pending.get(fp)
            if cur is None:
                pending[fp] = (keys[i], float(cash[i]))
            else:
                k = keys[i] if keys[i] < cur[0] else cur[0]
                pending[fp] = (k, cur[1] + float(cash[i]))
        return n

    def resolve(self, out_path: str, seen_path: str | None = None) -> dict:
        """Admit pending winners: decode → enrich → score → write parquet
        delta at out_path (omitted if empty). Also checkpoints this shard's
        seen blob to seen_path (shard-side, parallel across the pool — the
        driver never serializes filter state). Returns per-partition counts."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..stages.enrich import enrich_urls
        from .. import schema as S

        pending = self.pending
        if not pending:
            if seen_path is not None:
                with open(seen_path, "wb") as f:
                    f.write(self.dump())
            return {"count": 0, "per_partition": {}, "path": None}
        fps = np.fromiter(pending.keys(), dtype=np.uint64, count=len(pending))
        order = np.argsort(fps, kind="stable")
        fps = fps[order]
        items = [pending[int(f)] for f in fps]
        n = len(items)
        depths = np.empty(n, dtype=np.int32)
        parents = np.empty(n, dtype=np.uint64)
        urls: list[str] = [""] * n
        cash = np.empty(n, dtype=np.float64)
        for i, (k, c) in enumerate(items):
            d, p, u = k.split("|", 2)
            depths[i] = int(d)
            parents[i] = int(p, 16)
            urls[i] = u
            cash[i] = c
        t = enrich_urls(pa.table({"url": pa.array(urls, pa.string())}), self._np)
        if self._policy == "opic":
            score = cash
        else:
            score = 1.0 / (depths.astype(np.float64) + 1.0)
        tbl = pa.table(
            {
                "url": t["url"],
                "fp64": t["fp64"],
                "fp_hex": t["fp_hex"],
                "host": t["host"],
                "host_hash": t["host_hash"],
                "partition": t["partition"],
                "state": pa.array(np.full(n, S.QUEUED, dtype=np.uint8)),
                "score": pa.array(score, pa.float64()),
                "depth": pa.array(depths, pa.int32()),
                "discovered_epoch": pa.array(
                    np.full(n, self._epoch, dtype=np.int32)
                ),
                "fetched_epoch": pa.array(np.full(n, -1, dtype=np.int32)),
                "status_code": pa.array(np.full(n, -1, dtype=np.int16)),
                "parent_fp64": pa.array(parents, pa.uint64()),
            }
        ).cast(S.FRONTIER)
        pq.write_table(tbl, out_path)
        # mark seen
        self.add_if_new(fps)
        if seen_path is not None:
            with open(seen_path, "wb") as f:
                f.write(self.dump())
        parts, counts = np.unique(
            t["partition"].to_numpy(zero_copy_only=False), return_counts=True
        )
        self.pending = {}
        return {
            "count": n,
            "per_partition": {int(p): int(c) for p, c in zip(parts, counts)},
            "path": out_path,
        }

    def contains(self, fps: np.ndarray) -> np.ndarray:
        fps = np.asarray(fps, dtype=np.uint64)
        out = np.fromiter(
            (int(k) in self.exact for k in fps), dtype=bool, count=len(fps)
        )
        if self.runs:
            out |= self._runs_contains(fps)
        return out

    def size(self) -> int:
        return len(self.exact) + sum(len(r) for r in self.runs)

    def keys(self) -> np.ndarray:
        """Sorted uint64 fingerprints (parity-check boundary)."""
        parts = [np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))]
        parts.extend(self.runs)
        allk = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        allk.sort()
        return allk

    # -- checkpoint ------------------------------------------------------
    def dump(self) -> bytes:
        """Byte-stable: one sorted uint64 array regardless of the internal
        hot-set/frozen-run split (spill state is an implementation detail,
        not checkpoint content)."""
        ck = self.cuckoo.dump()
        bl = self.bloom.dump() if self.bloom is not None else b""
        exact = self.keys()
        header = struct.pack(
            "<4sQQQQQ", _MAGIC, self.shard_id, self.capacity, len(ck), len(bl), len(exact)
        )
        return header + ck + bl + exact.tobytes()

    @classmethod
    def restore(cls, data: bytes) -> "SeenShard":
        magic, sid, cap, nck, nbl, nex = struct.unpack_from("<4sQQQQQ", data, 0)
        assert magic == _MAGIC
        obj = cls.__new__(cls)
        obj.shard_id = sid
        obj.capacity = cap
        off = struct.calcsize("<4sQQQQQ")
        obj.cuckoo = CuckooFilter.restore(data[off : off + nck])
        off += nck
        obj.bloom = BloomFilter.restore(data[off : off + nbl]) if nbl else None
        off += nbl
        # restore into ONE frozen run (8 B/key) — no hot-set rebuild
        arr = np.frombuffer(data, dtype=np.uint64, count=nex, offset=off).copy()
        obj.exact = set()
        obj.runs = [arr] if len(arr) else []
        obj.spill_threshold = 1 << 22
        return obj

    # remote-friendly restore-in-place (actor method)
    def load(self, data: bytes) -> int:
        other = SeenShard.restore(data)
        self.shard_id = other.shard_id
        self.capacity = other.capacity
        self.cuckoo = other.cuckoo
        self.bloom = other.bloom
        self.exact = other.exact
        self.runs = other.runs
        self.spill_threshold = other.spill_threshold
        return self.size()
