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
  "definitely new" fast path with one vectorized probe), an **exact store**
  as the authoritative layer behind it (confirms filter positives → zero
  false drops, required for seen-set parity with the reference), and a
  **bloom filter fallback** that takes over inserts if the cuckoo filter
  saturates.
* The exact store is fully array-backed (round-2 rewrite — no per-key
  Python loops anywhere): a sorted uint64 "hot" array + small unsorted
  tail buffers (merged in when they exceed ``_TAIL_MAX``), frozen sorted
  runs past ``spill_threshold``, and optionally **disk-spilled runs**
  (sorted uint64 .npy files probed via memory-mapped searchsorted) past
  ``max_resident_keys`` — the 10^10-URL path where the actor heap stops
  being the ceiling. Membership anywhere is vectorized searchsorted/isin.
* All calls are batch-vectorized; an actor round-trip carries one numpy
  array per shard per epoch, not per URL.
* ``dump()/restore()`` are byte-stable → the whole seen-set checkpoints to
  one blob per shard per epoch and the crawl resumes exactly (north rule).
  (At 10^10 keys the checkpoint would reference the immutable spill files
  instead of inlining them — documented scale path, not needed here.)
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .cuckoo import CuckooFilter
from .bloom import BloomFilter

_MAGIC = b"SEEN"
_TAIL_MAX = 1 << 16


def _sorted_contains(sorted_arr: np.ndarray, fps: np.ndarray) -> np.ndarray:
    if len(sorted_arr) == 0:
        return np.zeros(len(fps), dtype=bool)
    idx = np.minimum(np.searchsorted(sorted_arr, fps), len(sorted_arr) - 1)
    return sorted_arr[idx] == fps


class SeenShard:
    """One shard of the URL-seen set. Plain class; wrapped in ray.remote by
    the pipeline (so tests can exercise it without a cluster)."""

    def __init__(
        self,
        shard_id: int,
        capacity: int = 1 << 20,
        spill_threshold: int = 1 << 22,
        spill_dir: str | None = None,
        max_resident_keys: int = 1 << 26,
    ):
        self.shard_id = shard_id
        self.capacity = capacity
        self.cuckoo = CuckooFilter(capacity, seed=shard_id)
        self.bloom: BloomFilter | None = None
        # authoritative store = sorted hot array + unsorted tail buffers +
        # frozen sorted runs (8 B/key; runs are disjoint by construction
        # since membership is checked before add) + optional disk runs
        self.hot = np.zeros(0, dtype=np.uint64)
        self.tails: list[np.ndarray] = []
        self.tail_n = 0
        self.runs: list[np.ndarray] = []
        self.spill_threshold = spill_threshold
        self.spill_dir = spill_dir
        self.max_resident_keys = max_resident_keys
        self._spill_seq = 0

    # -- array-store helpers --------------------------------------------
    def _runs_contains(self, fps: np.ndarray) -> np.ndarray:
        out = np.zeros(len(fps), dtype=bool)
        for run in self.runs:
            out |= _sorted_contains(run, fps)
        return out

    def _exact_contains(self, fps: np.ndarray) -> np.ndarray:
        """Vectorized membership in the authoritative store."""
        out = _sorted_contains(self.hot, fps)
        for t in self.tails:
            out |= np.isin(fps, t)
        if self.runs:
            out |= self._runs_contains(fps)
        return out

    def _absorb_tails(self) -> None:
        if not self.tails:
            return
        self.hot = np.concatenate([self.hot, *self.tails])
        self.hot.sort()
        self.tails = []
        self.tail_n = 0

    def _append_new(self, arr: np.ndarray) -> None:
        """Insert keys known to be absent (disjointness invariant)."""
        self.tails.append(arr)
        self.tail_n += len(arr)
        if self.tail_n > _TAIL_MAX:
            self._absorb_tails()
        self._maybe_spill()

    def _maybe_spill(self) -> None:
        if len(self.hot) + self.tail_n <= self.spill_threshold:
            return
        self._absorb_tails()
        self.runs.append(self.hot)
        self.hot = np.zeros(0, dtype=np.uint64)
        ram = [r for r in self.runs if not isinstance(r, np.memmap)]
        disk = [r for r in self.runs if isinstance(r, np.memmap)]
        if len(ram) > 4:  # bound probe cost: compact RAM runs to one
            merged = np.concatenate(ram)
            merged.sort()
            ram = [merged]
        if (
            self.spill_dir is not None
            and sum(len(r) for r in ram) > self.max_resident_keys
        ):
            # spill the merged resident keys to one immutable sorted .npy
            # (binary-searchable via mmap — no decode on probe, O(log n)
            # page touches; parquet would force row-group decodes instead)
            merged = np.concatenate(ram) if len(ram) > 1 else ram[0]
            merged.sort()
            os.makedirs(self.spill_dir, exist_ok=True)
            path = os.path.join(
                self.spill_dir, f"run-{self.shard_id}-{self._spill_seq:06d}.npy"
            )
            self._spill_seq += 1
            np.save(path, merged)
            disk.append(np.load(path, mmap_mode="r"))
            ram = []
        if len(disk) > 8:  # bound disk-probe fan-out
            merged = np.concatenate([np.asarray(d) for d in disk])
            merged.sort()
            path = os.path.join(
                self.spill_dir, f"run-{self.shard_id}-{self._spill_seq:06d}.npy"
            )
            self._spill_seq += 1
            np.save(path, merged)
            disk = [np.load(path, mmap_mode="r")]
        self.runs = ram + disk

    # -- core op: test-and-set, vectorized ------------------------------
    def add_if_new(self, fps: np.ndarray) -> np.ndarray:
        """For each fingerprint: True if it was NOT seen before (and mark it
        seen). Duplicates *within* the batch: first occurrence wins.

        Exactness: the cuckoo/bloom filters short-circuit only the negative
        path; any filter hit is confirmed against the exact store, so the
        result has neither false drops nor false admits. Fully vectorized
        (np.unique in-batch dedup + searchsorted membership).
        """
        fps = np.asarray(fps, dtype=np.uint64)
        n = len(fps)
        if n == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(fps, return_index=True)
        maybe = self.cuckoo.contains_batch(uniq)
        if self.bloom is not None:
            maybe |= self.bloom.contains_batch(uniq)
        seen = np.zeros(len(uniq), dtype=bool)
        if maybe.any():
            mi = np.where(maybe)[0]
            seen[mi] = self._exact_contains(uniq[mi])
        new_uniq = uniq[~seen]
        new = np.zeros(n, dtype=bool)
        new[first_idx[~seen]] = True
        if len(new_uniq):
            self._append_new(new_uniq)
            # cuckoo until capacity; once full, freeze it and route new keys
            # to the bloom fallback (north rule: bloom fallback per partition)
            if (
                self.bloom is None
                and self.cuckoo.count + len(new_uniq) <= self.capacity
            ):
                self.cuckoo.add_batch(new_uniq)
            else:
                if self.bloom is None:
                    self.bloom = BloomFilter(self.capacity * 4)
                self.bloom.add_batch(new_uniq)
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

    def begin_epoch(
        self, epoch: int, policy: str, num_partitions: int, mode: str = "links"
    ) -> None:
        """mode="links": cash is OPIC contribution (summed over edges).
        mode="seeds": cash is the seed-file score (max over duplicates) and
        becomes the row score verbatim under EVERY policy — distributed
        seed init routes through the same protocol."""
        self.pending_frames: list = []
        self._epoch = epoch
        self._policy = policy
        self._np = num_partitions
        self._mode = mode
        self._offer_calls = 0

    def offer(self, fps: np.ndarray, keys: list[str], cash: np.ndarray) -> int:
        """Accumulate candidate edges for unseen fps; returns #accepted.
        Vectorized: one membership probe + one frame append per call."""
        import pandas as pd

        self._offer_calls += 1
        fps = np.asarray(fps, dtype=np.uint64)
        if len(fps) == 0:
            return 0
        unseen = ~self._exact_contains(fps)
        n = int(unseen.sum())
        if n:
            self.pending_frames.append(
                pd.DataFrame(
                    {
                        "fp64": fps[unseen],
                        "key": np.asarray(keys, dtype=object)[unseen],
                        "cash": np.asarray(cash, dtype=np.float64)[unseen],
                    }
                )
            )
        return n

    def resolve(self, out_path: str, seen_path: str | None = None) -> dict:
        """Admit pending winners: decode → enrich → score → write parquet
        delta at out_path (omitted if empty). Also checkpoints this shard's
        seen blob to seen_path (shard-side, parallel across the pool — the
        driver never serializes filter state). Returns per-partition counts."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..stages.enrich import enrich_urls
        from .. import schema as S

        frames = self.pending_frames
        if not frames:
            if seen_path is not None:
                with open(seen_path, "wb") as f:
                    f.write(self.dump())
            return {"count": 0, "per_partition": {}, "path": None}
        df = pd.concat(frames, ignore_index=True)
        cash_agg = "max" if self._mode == "seeds" else "sum"
        # min(key)/sum-or-max(cash) are order-independent ⇒ the admitted
        # winners are identical under any batch arrival order; groupby
        # sorts the unique fps, giving the deterministic row order.
        agg = df.groupby("fp64", sort=True).agg(
            key=("key", "min"), cash=("cash", cash_agg)
        )
        n = len(agg)
        keysplit = agg["key"].str.split("|", n=2, expand=True)
        depths = keysplit[0].astype(np.int32).to_numpy()
        parents = np.array([int(p, 16) for p in keysplit[1]], dtype=np.uint64)
        urls = keysplit[2].tolist()
        cash = agg["cash"].to_numpy(dtype=np.float64)
        t = enrich_urls(pa.table({"url": pa.array(urls, pa.string())}), self._np)
        if self._policy == "opic" or self._mode == "seeds":
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
        self.add_if_new(agg.index.to_numpy(dtype=np.uint64))
        if seen_path is not None:
            with open(seen_path, "wb") as f:
                f.write(self.dump())
        parts, counts = np.unique(
            t["partition"].to_numpy(zero_copy_only=False), return_counts=True
        )
        self.pending_frames = []
        return {
            "count": n,
            "per_partition": {int(p): int(c) for p, c in zip(parts, counts)},
            "path": out_path,
        }

    def offers_processed(self) -> int:
        """Barrier support for ASYNC offers: the driver compares this to
        the submitted-call count reported through the gate partials and
        only resolves once every in-flight offer has been absorbed."""
        return getattr(self, "_offer_calls", 0)

    def contains(self, fps: np.ndarray) -> np.ndarray:
        fps = np.asarray(fps, dtype=np.uint64)
        return self._exact_contains(fps)

    def size(self) -> int:
        return len(self.hot) + self.tail_n + sum(len(r) for r in self.runs)

    def keys(self) -> np.ndarray:
        """Sorted uint64 fingerprints (parity-check boundary)."""
        parts = [self.hot, *self.tails] + [np.asarray(r) for r in self.runs]
        allk = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        allk.sort()
        return allk

    # -- checkpoint ------------------------------------------------------
    def dump(self) -> bytes:
        """Byte-stable: one sorted uint64 array regardless of the internal
        hot/tail/frozen-run/disk split (spill state is an implementation
        detail, not checkpoint content)."""
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
        # restore into ONE frozen run (8 B/key) — no hot-array rebuild
        arr = np.frombuffer(data, dtype=np.uint64, count=nex, offset=off).copy()
        obj.hot = np.zeros(0, dtype=np.uint64)
        obj.tails = []
        obj.tail_n = 0
        obj.runs = [arr] if len(arr) else []
        obj.spill_threshold = 1 << 22
        obj.spill_dir = None
        obj.max_resident_keys = 1 << 26
        obj._spill_seq = 0
        return obj

    # remote-friendly restore-in-place (actor method)
    def load(self, data: bytes) -> int:
        other = SeenShard.restore(data)
        self.shard_id = other.shard_id
        self.capacity = other.capacity
        self.cuckoo = other.cuckoo
        self.bloom = other.bloom
        self.hot = other.hot
        self.tails = other.tails
        self.tail_n = other.tail_n
        self.runs = other.runs
        return self.size()
