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
    def __init__(self, cfg: CrawlConfig, politeness_ref, strategy=None):
        self.num_partitions = cfg.num_partitions
        self.schemes = tuple(f"{s}://" for s in cfg.allowed_schemes)
        self.max_depth = cfg.max_depth
        self.obey_robots = cfg.obey_robots
        # a PolitenessClient (broadcast or actor-pool placement)
        self.politeness = politeness_ref
        self.strategy = strategy  # CrawlStrategy.filter_extracted_links hook

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
            hosts = batch["host"].to_pylist()
            ok &= self.politeness.allowed_mask(hosts, urls)
        if self.strategy is not None:
            ok &= np.asarray(
                self.strategy.filter_extracted_links(batch), dtype=bool
            )
        return batch.append_column("allowed", pa.array(ok))


class AdmitOfferStage:
    """Fused gate + offer (ONE Dataset execution per epoch): applies
    AdmitLinks (scheme/depth/robots gate + enrichment), offers the allowed
    rows to the seen shards, and returns per-batch gate-counter partials
    (partition, ok, n) — the A1 partial-aggregation pattern. Fusing stages
    matters at scale: every separate materialize/execute is a pipeline
    barrier whose fixed latency is serial time under Amdahl."""

    def __init__(
        self, cfg: CrawlConfig, politeness_ref, shard_handles: list, strategy=None
    ):
        self.cfg = cfg
        self.admit = AdmitLinks(cfg, politeness_ref, strategy)
        self.offer = OfferStage(shard_handles)
        # the fast path below reproduces the gate+offer semantics exactly
        # but cannot see a user hook's per-edge decisions — hook ⇒ legacy
        self.has_hook = strategy is not None and type(
            strategy
        ).filter_extracted_links is not _base_filter_extracted_links()

    _EMPTY = None  # class-level cache of the empty counters table

    @staticmethod
    def _empty_counters() -> pa.Table:
        return pa.table(
            {
                "partition": pa.array([], pa.int32()),
                "ok": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int32()),
                "offers": pa.array([], pa.int64()),
            }
        )

    @staticmethod
    def _with_offer_rows(counters: pa.Table, used_shards: list[int]) -> pa.Table:
        """Gate-counter rows (shard=-1) + one row per shard this batch
        submitted an ASYNC offer to (partition=-1). The driver sums the
        `offers` column per shard as the resolve barrier's expected call
        count — offers stop blocking the map task (one network RTT per
        batch per shard on a real cluster) and overlap with extraction."""
        n = counters.num_rows
        counters = counters.append_column(
            "shard", pa.array(np.full(n, -1, dtype=np.int32))
        ).append_column("offers", pa.array(np.zeros(n, dtype=np.int64)))
        if not used_shards:
            return counters
        k = len(used_shards)
        extra = pa.table(
            {
                "partition": pa.array(np.full(k, -1, dtype=np.int32)),
                "ok": pa.array(np.zeros(k, dtype=np.int64)),
                "n": pa.array(np.zeros(k, dtype=np.int64)),
                "shard": pa.array(np.asarray(used_shards, dtype=np.int32)),
                "offers": pa.array(np.ones(k, dtype=np.int64)),
            }
        )
        return pa.concat_tables([counters, extra])

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return self._empty_counters()
        if self.has_hook:
            return self._legacy(t)
        return self._fast(t)

    def _legacy(self, t: pa.Table) -> pa.Table:
        gated = self.admit(t)
        allowed = gated.filter(gated.column("allowed"))
        used = self.offer.offer_async(allowed)
        parts = gated["partition"].to_numpy(zero_copy_only=False)
        ok = gated["allowed"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"partition": parts, "ok": ok})
        g = df.groupby("partition").agg(ok=("ok", "sum"), n=("ok", "size"))
        counters = pa.table(
            {
                "partition": pa.array(g.index.to_numpy(), pa.int32()),
                "ok": pa.array(g["ok"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )
        return self._with_offer_rows(counters, used)

    def _fast(self, t: pa.Table) -> pa.Table:
        """Factorize-first gate+offer (round-3): most extracted edges in a
        batch repeat the same raw URL, so canonicalization + sha1 + robots
        run once per DISTINCT raw url, and the per-edge work is numpy
        indexing. Two-level aggregation keeps the offer protocol exact:
        level A (per raw url, all-numeric — url is constant in the group,
        so the winner edge is min (depth, parent_fp64) via ONE lexsort);
        level B (per fp64, merges canonicalization collisions) builds the
        winner-key strings only for the surviving uniques."""
        cfg = self.cfg
        raw = t["url"].to_pylist()
        codes, uniq = pd.factorize(np.array(raw, dtype=object))
        u_tbl = enrich_urls(
            pa.table({"url": pa.array(uniq, pa.string())}), cfg.num_partitions
        )
        u_urls = u_tbl["url"].to_pylist()  # canonical
        ok_u = np.fromiter(
            (u.startswith(self.admit.schemes) for u in u_urls),
            dtype=bool,
            count=len(u_urls),
        )
        if self.admit.obey_robots:
            ok_u &= self.admit.politeness.allowed_mask(
                u_tbl["host"].to_pylist(), u_urls
            )
        part_u = u_tbl["partition"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok_e = ok_u[codes]
        if self.admit.max_depth is not None:
            depths_e = t["depth"].to_numpy(zero_copy_only=False)
            ok_e = ok_e & (depths_e <= self.admit.max_depth)
        # per-partition EDGE counters (identical to the legacy per-edge
        # groupby): n = edges, ok = allowed edges
        parts_e = part_u[codes]
        nP = int(parts_e.max()) + 1
        n_cnt = np.bincount(parts_e, minlength=nP)
        ok_cnt = np.bincount(parts_e[ok_e], minlength=nP)
        present = np.flatnonzero(n_cnt)
        counters = pa.table(
            {
                "partition": pa.array(present.astype(np.int32), pa.int32()),
                "ok": pa.array(ok_cnt[present].astype(np.int64), pa.int64()),
                "n": pa.array(n_cnt[present].astype(np.int64), pa.int64()),
            }
        )
        if not ok_e.any():
            return self._with_offer_rows(counters, [])
        # ---- level A: per raw-url winner + cash sum over allowed edges
        codes_a = codes[ok_e]
        depth_a = t["depth"].to_numpy(zero_copy_only=False)[ok_e]
        parent_a = (
            t["parent_fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)[ok_e]
        )
        cash_a = (
            t["parent_score"].to_numpy(zero_copy_only=False)
            / np.maximum(t["parent_outdeg"].to_numpy(zero_copy_only=False), 1)
        )[ok_e]
        order = np.lexsort((parent_a, depth_a, codes_a))
        sc = codes_a[order]
        first = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        win_rows = order[first]  # winner edge per present code
        pres_codes = sc[first]
        cash_u = np.bincount(codes_a, weights=cash_a, minlength=len(uniq))
        # ---- level B: merge canonicalization collisions on fp64
        fp_u = u_tbl["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = [
            f"{int(d):06d}|{int(p):016x}|{u_urls[c]}"
            for d, p, c in zip(depth_a[win_rows], parent_a[win_rows], pres_codes)
        ]
        agg = pd.DataFrame(
            {
                "fp64": fp_u[pres_codes],
                "key": keys,
                "cash": cash_u[pres_codes],
                "partition": part_u[pres_codes],
            }
        ).groupby("fp64", sort=False).agg(
            key=("key", "min"), cash=("cash", "sum"), partition=("partition", "first")
        )
        shard_of = agg["partition"].to_numpy() % len(self.offer.shards)
        used = []
        for s in np.unique(shard_of):
            sub = agg[shard_of == s]
            # ASYNC: actor submission is eager; the driver's count barrier
            # (crawl.run_epoch) guarantees absorption before resolve
            self.offer.shards[int(s)].offer.remote(
                sub.index.to_numpy(dtype=np.uint64),
                sub["key"].tolist(),
                sub["cash"].to_numpy(),
            )
            used.append(int(s))
        return self._with_offer_rows(counters, used)


def _base_filter_extracted_links():
    from ..strategy import CrawlStrategy

    return CrawlStrategy.filter_extracted_links


class OfferStage:
    """map_batches callable: route gated link rows to their seen shard via
    the offer protocol (see state/seen.py). Pre-aggregates per batch with a
    vectorized pandas groupby (min winner_key, sum cash) so each actor call
    carries one row per distinct child in the batch. Returns per-batch
    counts only — the data path to the frontier is shard-side."""

    def __init__(self, shard_handles: list):
        self.shards = shard_handles

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        if t.num_rows == 0:
            return pa.table({"offered": pa.array([], pa.int64())})
        depth = t["depth"].to_pylist()
        parent = t["parent_fp64"].to_pylist()
        urls = t["url"].to_pylist()
        # winner key "dddddd|pppppppppppppppp|url": fixed-width numeric
        # fields make lexicographic min == tuple min. (Measured: the
        # f-string loop beats np.char/pandas string concat 3x.)
        # COLD PATH: nothing in the crawl invokes __call__ — the epoch
        # loop goes through AdmitOfferStage._fast (factorize-first, keys
        # built once per surviving distinct url). This synchronous entry
        # exists for standalone/offline use of the offer protocol only.
        keys = [f"{d:06d}|{p:016x}|{u}" for d, p, u in zip(depth, parent, urls)]
        cash = (
            t["parent_score"].to_numpy(zero_copy_only=False)
            / np.maximum(t["parent_outdeg"].to_numpy(zero_copy_only=False), 1)
        )
        df = pd.DataFrame(
            {
                "fp64": t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64),
                "partition": t["partition"].to_numpy(zero_copy_only=False),
                "key": keys,
                "cash": cash,
            }
        )
        agg = df.groupby("fp64", sort=False).agg(
            key=("key", "min"), cash=("cash", "sum"), partition=("partition", "first")
        )
        shard_of = agg["partition"].to_numpy() % len(self.shards)
        futs = []
        for s in np.unique(shard_of):
            sub = agg[shard_of == s]
            futs.append(
                self.shards[int(s)].offer.remote(
                    sub.index.to_numpy(dtype=np.uint64),
                    sub["key"].tolist(),
                    sub["cash"].to_numpy(),
                )
            )
        total = int(sum(ray.get(futs)))
        return pa.table({"offered": pa.array([total], pa.int64())})

    def offer_async(self, t: pa.Table) -> list[int]:
        """Submit this batch's offers WITHOUT waiting (actor submission is
        eager) and return the shard indices used, for the driver's
        count-based resolve barrier."""
        if t.num_rows == 0:
            return []
        depth = t["depth"].to_pylist()
        parent = t["parent_fp64"].to_pylist()
        urls = t["url"].to_pylist()
        # COLD PATH: reached only from AdmitOfferStage._legacy, i.e. when
        # a custom link-filter hook is installed (the dirty-variant pass);
        # the default crawl admits through _fast's factorize-first keys.
        keys = [f"{d:06d}|{p:016x}|{u}" for d, p, u in zip(depth, parent, urls)]
        cash = (
            t["parent_score"].to_numpy(zero_copy_only=False)
            / np.maximum(t["parent_outdeg"].to_numpy(zero_copy_only=False), 1)
        )
        df = pd.DataFrame(
            {
                "fp64": t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64),
                "partition": t["partition"].to_numpy(zero_copy_only=False),
                "key": keys,
                "cash": cash,
            }
        )
        agg = df.groupby("fp64", sort=False).agg(
            key=("key", "min"), cash=("cash", "sum"), partition=("partition", "first")
        )
        shard_of = agg["partition"].to_numpy() % len(self.shards)
        used = []
        for s in np.unique(shard_of):
            sub = agg[shard_of == s]
            self.shards[int(s)].offer.remote(
                sub.index.to_numpy(dtype=np.uint64),
                sub["key"].tolist(),
                sub["cash"].to_numpy(),
            )
            used.append(int(s))
        return used


def aggregate_candidates(admitted_ds, cfg: CrawlConfig):
    """groupby(fp64) dedup + score → FRONTIER-shaped QUEUED rows Dataset.

    Vectorized winner selection: NOT per-group map_groups (which pays one
    Python call per child URL — millions per epoch at scale) but a single
    hash-aggregate with an order-encoding winner key:
        winner_key = f"{depth:06d}|{parent_fp64:016x}|{url}"
    Min(winner_key) ≡ min (depth, parent_fp64, url) because each field is
    fixed-width (url last, variable). OPIC cash is a plain Sum. The winner
    row's remaining columns are re-derived from the decoded url — cheap,
    deterministic, and only over the already-deduped rows."""
    policy = cfg.policy
    epoch_col = "discovered_epoch"

    def prep(t: pa.Table) -> pa.Table:
        depth = t["depth"].to_pylist()
        parent = t["parent_fp64"].to_pylist()
        urls = t["url"].to_pylist()
        # COLD PATH: aggregate_candidates is the Dataset-shuffle
        # alternative kept for path-equivalence testing (T3); the crawl's
        # epoch loop schedules via per-partition files and admits through
        # AdmitOfferStage._fast — this prep never runs in the hot loop.
        keys = [
            f"{d:06d}|{p:016x}|{u}" for d, p, u in zip(depth, parent, urls)
        ]
        cash = (
            t["parent_score"].to_numpy(zero_copy_only=False)
            / np.maximum(t["parent_outdeg"].to_numpy(zero_copy_only=False), 1)
        )
        # group on an int64 VIEW of fp64: Ray's shuffle handles uint64 group
        # keys via a slow pickled-object fallback; the bit-identical int64
        # reinterpretation keeps grouping exact and Arrow-native
        key = (
            t["fp64"]
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
            .view(np.int64)
        )
        return pa.table(
            {
                "fpkey": pa.array(key, pa.int64()),
                "winner_key": pa.array(keys, pa.string()),
                "cash": pa.array(cash, pa.float64()),
                epoch_col: t[epoch_col],
            }
        )

    from ray.data.aggregate import Min, Sum

    agg = (
        admitted_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("fpkey")
        .aggregate(
            Min("winner_key", alias_name="winner_key"),
            Sum("cash", alias_name="opic_cash"),
            Min(epoch_col, alias_name=epoch_col),
        )
    )

    num_partitions = cfg.num_partitions

    def decode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        depths = np.empty(n, dtype=np.int32)
        parents = np.empty(n, dtype=np.uint64)
        urls: list[str] = [""] * n
        for i, k in enumerate(batch["winner_key"].to_pylist()):
            d, p, u = k.split("|", 2)
            depths[i] = int(d)
            parents[i] = int(p, 16)
            urls[i] = u
        t = enrich_urls(pa.table({"url": pa.array(urls, pa.string())}), num_partitions)
        if policy == "opic":
            score = batch["opic_cash"].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            score = 1.0 / (depths.astype(np.float64) + 1.0)
        return pa.table(
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
                "discovered_epoch": pa.compute.cast(batch[epoch_col], pa.int32()),
                "fetched_epoch": pa.array(np.full(n, -1, dtype=np.int32)),
                "status_code": pa.array(np.full(n, -1, dtype=np.int16)),
                "parent_fp64": pa.array(parents, pa.uint64()),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def offer_seed_rows(shard_handles: list, rows: pa.Table) -> int:
    """Route FRONTIER-shaped seed rows to their owning shards via the offer
    protocol (shards must be in begin_epoch(-1, …, mode="seeds")): key =
    depth-0 winner key, cash = the seed score (max-aggregated for dup
    seeds). Callable from the driver (small seed lists) and from the
    Dataset stage below (10^8-row seed lists — VERDICT #7)."""
    if rows.num_rows == 0:
        return 0
    urls = rows["url"].to_pylist()
    keys = [f"{0:06d}|{0:016x}|{u}" for u in urls]
    fps = rows["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
    parts = rows["partition"].to_numpy(zero_copy_only=False).astype(np.int64)
    cash = rows["score"].to_numpy(zero_copy_only=False).astype(np.float64)
    shard_of = parts % len(shard_handles)
    futs = []
    for s in np.unique(shard_of):
        m = shard_of == s
        futs.append(
            shard_handles[int(s)].offer.remote(
                fps[m], [k for k, keep in zip(keys, m) if keep], cash[m]
            )
        )
    return int(sum(ray.get(futs)))


class SeedOfferStage:
    """map_batches callable for DISTRIBUTED seed init: seed batch →
    strategy.read_seeds (enrich + score) → robots gate → offer to the seen
    shards. The driver never materializes the seed list; each batch's rows
    go straight from the scan task to the owning shard actors. Returns
    per-batch (offered, gated) counts only."""

    def __init__(self, cfg: CrawlConfig, politeness_ref, shard_handles, strategy):
        self.cfg = cfg
        self.politeness = politeness_ref
        self.shards = shard_handles
        self.strategy = strategy

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = self.strategy.read_seeds(t, self.cfg)
        n_in = rows.num_rows
        if self.cfg.obey_robots and n_in:
            mask = self.politeness.allowed_mask(
                rows["host"].to_pylist(), rows["url"].to_pylist()
            )
            rows = rows.filter(pa.array(mask))
        offered = offer_seed_rows(self.shards, rows)
        return pa.table(
            {
                "offered": pa.array([offered], pa.int64()),
                "gated": pa.array([n_in - rows.num_rows], pa.int64()),
            }
        )


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
