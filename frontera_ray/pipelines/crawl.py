"""The epoch-loop crawl driver (SURVEY.md §3.4) — replaces all three
reference entry points (local manager frontera/core/manager.py:~100-400,
strategy worker worker/strategy.py, db worker worker/db.py — approximate
cites, SURVEY.md §0) with one plain-Python loop over Ray Data stages
(round-2 shape — shuffle-free, O(delta) frontier maintenance):

    epoch e:
      sched = schedule_files(frontier file map − tombstones)
                                   # T3/O1-O4: one plain task per partition
                                   # (files are partition-pure), NO shuffle
      fetch→out→extract→admit→offer  # ONE fused streaming execution on
                                   # canonical stores (two-pass only when
                                   # dirty URL variants need winner picks)
      resolve (shard actors)       # A3/A4 dedup+score, per-partition
                                   # QUEUED delta + seen blob written
                                   # shard-side
      frontier_{e+1} = files + deltas; sched fps tombstoned; compaction
                                   # rewrites only when tombstones dominate
      checkpoint(manifest: file map, tombstones, done Δ, out, order,
                 counters, seen)   # manifest-last atomicity, exact resume

State machine parity with the reference (NOT_CRAWLED→QUEUED→CRAWLED/ERROR):
admission = NOT_CRAWLED→QUEUED (guarded by the seen set, J3/J4); fetch hit =
CRAWLED(200); fetch miss = ERROR(404 in the simulator).

Everything wide stays a Dataset or a per-partition task; the driver only
ever holds the scheduled batch (≤ P × max_next_requests rows), per-epoch
counters, and the crawl order — all bounded by the politeness budget,
independent of frontier size.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .. import schema as S
from ..config import CrawlConfig
from ..sources.checkpoint import Checkpoint
from ..stages.schedule import schedule_files
from ..stages.fetch_sim import fetch_sim, winner_raw_urls
from ..stages.extract import ExtractAllLinks
from ..stages.links import AdmitOfferStage, SeedOfferStage, offer_seed_rows
from ..stages.seen_filter import make_seen_pool, restore_shards
from ..state.politeness import (
    PolitenessClient,
    PolitenessIndex,
    collect_robots,
    make_politeness_pool,
)


@ray.remote
def _compact_partition(paths: list[str], tomb_paths: list[str], out_path: str):
    """Read one partition's queued files, drop fps tombstoned in the
    partition's tombstone files (read task-side — the driver ships only
    paths), write one compacted file; None when nothing survives."""
    t = pa.concat_tables([pq.read_table(p) for p in paths])
    tomb = (
        np.concatenate(
            [
                pq.read_table(p)["fp64"].to_numpy(zero_copy_only=False)
                for p in tomb_paths
            ]
        ).astype(np.uint64)
        if tomb_paths
        else np.zeros(0, np.uint64)
    )
    fps = t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
    t = t.filter(pa.array(~np.isin(fps, tomb)))
    if t.num_rows == 0:
        return None
    pq.write_table(t, out_path)
    return out_path


def _counters_table(epoch: int, rows: list[tuple[int, str, int]]) -> pa.Table:
    return pa.table(
        {
            "epoch": pa.array([epoch] * len(rows), pa.int32()),
            "partition": pa.array([r[0] for r in rows], pa.int32()),
            "metric": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _per_partition_counts(df: pd.DataFrame, metric: str, epoch: int) -> list[tuple[int, str, int]]:
    if df.empty:
        return []
    c = df.groupby("partition").size()
    return [(int(p), metric, int(v)) for p, v in c.items()]


class Crawler:
    """Owns the seen-shard actor pool + checkpoint store for one crawl run."""

    def __init__(self, cfg: CrawlConfig, strategy=None):
        from ..strategy import CrawlStrategy

        self.cfg = cfg
        self.ck = Checkpoint(cfg.checkpoint_dir)
        self.shards = make_seen_pool(
            cfg.num_partitions,
            cfg.seen_capacity,
            cfg.seen_spill_threshold,
            cfg.seen_spill_dir,
            cfg.seen_max_resident_keys,
        )
        self.politeness_ref = None
        self.host_caps = None  # Crawl-delay caps; filled by _build_politeness
        self.strategy = strategy if strategy is not None else CrawlStrategy()
        self.seq = 0
        self._seen_epoch = -1  # newest epoch whose seen blobs are on disk
        # one materialized pages Dataset shared by robots collection and
        # every epoch's fetch (cfg.cache_pages_in_memory; blocks live
        # distributed in the object store, never on the driver)
        self.pages_ds = None

    # -- setup ----------------------------------------------------------
    def _build_politeness(self) -> None:
        from ..state.politeness import crawl_delay_caps

        rules = (
            collect_robots(self.cfg.pages_paths, pages_ds=self.pages_ds)
            if self.cfg.obey_robots
            else {}
        )
        # Crawl-delay → per-host per-epoch caps (empty when none declared)
        self.host_caps = crawl_delay_caps(rules, self.cfg.epoch_seconds) or None
        if self.cfg.politeness_actors:
            handles = make_politeness_pool(self.cfg.num_partitions, rules)
            self.politeness_ref = PolitenessClient(shard_handles=handles)
        else:
            self.politeness_ref = PolitenessClient(
                broadcast_ref=ray.put(PolitenessIndex(rules))
            )

    def _init_frontier(self) -> None:
        """Seeds → enriched, robots-gated, admitted QUEUED rows → ckpt init,
        through the SAME offer/resolve protocol as link admission (round-2,
        VERDICT #7): shards dedup + write per-partition seed deltas + seen
        blobs themselves. Seed lists ≥ cfg.seed_driver_threshold rows stream
        through a Dataset stage — the driver never materializes them."""
        cfg = self.cfg
        ray.get(
            [
                s.begin_epoch.remote(-1, cfg.policy, cfg.num_partitions, "seeds")
                for s in self.shards
            ]
        )
        n_seeds = (
            pq.ParquetFile(cfg.seeds_path).metadata.num_rows
            if cfg.seeds_path.endswith(".parquet")
            else 0  # text seed lists use the driver path (S1 line format)
        )
        if n_seeds >= cfg.seed_driver_threshold:
            # split the (row-grouped) seed file into parallel admission tasks
            import ray as _r

            nblocks = max(4, int(_r.cluster_resources().get("CPU", 4)))
            rd.read_parquet(cfg.seeds_path, override_num_blocks=nblocks).map_batches(
                SeedOfferStage(cfg, self.politeness_ref, self.shards, self.strategy),
                batch_format="pyarrow",
            ).count()
        else:
            from ..sources.readers import read_seed_table

            rows = self.strategy.read_seeds(read_seed_table(cfg.seeds_path), cfg)
            if cfg.obey_robots and rows.num_rows:
                mask = self.politeness_ref.allowed_mask(
                    rows["host"].to_pylist(), rows["url"].to_pylist()
                )
                rows = rows.filter(pa.array(mask))
            offer_seed_rows(self.shards, rows)
        self.ck.prepare(-1)
        qdir = self.ck.queued_dir(-1)
        seen_dir = os.path.join(self.ck.epoch_dir(-1), "seen")
        resolves = ray.get(
            [
                s.resolve.remote(
                    os.path.join(qdir, f"new-shard-{k}.parquet"),
                    os.path.join(seen_dir, f"shard-{k}.bin"),
                )
                for k, s in enumerate(self.shards)
            ]
        )
        qmap = {
            k: [r["path"]] for k, r in enumerate(resolves) if r["count"]
        }
        self.ck.finish(
            -1,
            {
                "epoch": -1,
                "seq_next": 0,
                "queued": int(sum(r["count"] for r in resolves)),
                "queued_map": self.ck.rel_map(qmap),
                "tombstones_file": None,
                "seen_epoch": -1,  # seed blobs always written at init
                "config_fp": self._config_fingerprint(),
            },
        )

    # -- resume ---------------------------------------------------------
    def _config_fingerprint(self) -> str:
        import hashlib
        from dataclasses import asdict

        d = asdict(self.cfg)
        d.pop("checkpoint_dir", None)  # moving a checkpoint tree is fine
        return hashlib.md5(repr(sorted(d.items())).encode()).hexdigest()[:12]

    def _resume_from(self, epoch: int) -> None:
        manifest = self.ck.load_manifest(epoch)
        # restore the seen set from the newest blob epoch ≤ `epoch`, then
        # replay the O(delta) queued admission deltas of the blob-less
        # epochs after it (cadence > 1, VERDICT r2 #7) — every admitted fp
        # went through exactly one resolve() which wrote it to a
        # new-shard-* / inject-shard-* delta, so the replayed set is exact
        blob_epoch = int(manifest.get("seen_epoch", epoch))
        restore_shards(self.shards, self.ck.load_seen(blob_epoch))
        if blob_epoch < epoch:
            from ..stages.seen_filter import seed_seen

            for e in range(blob_epoch + 1, epoch + 1):
                qdir = self.ck.queued_dir(e)
                if not os.path.isdir(qdir):
                    continue
                for f in sorted(os.listdir(qdir)):
                    # compact-* files rewrite older (already-seen) rows —
                    # replaying them would be a no-op; skip the read
                    if not (
                        f.startswith(("new-shard-", "inject-shard-"))
                        and f.endswith(".parquet")
                    ):
                        continue
                    t = pq.read_table(
                        os.path.join(qdir, f), columns=["fp64", "partition"]
                    )
                    if t.num_rows:
                        seed_seen(
                            self.shards,
                            t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64),
                            t["partition"].to_numpy(zero_copy_only=False),
                        )
        self._seen_epoch = blob_epoch
        self.seq = int(manifest.get("seq_next", 0))
        prev_fp = manifest.get("config_fp")
        if prev_fp is not None and prev_fp != self._config_fingerprint():
            import warnings

            warnings.warn(
                f"resuming checkpoint written with a different config "
                f"(fp {prev_fp} != {self._config_fingerprint()}); the crawl "
                f"continues under the NEW config",
                stacklevel=2,
            )

    # -- revisit scheduler (T5) -----------------------------------------
    def _revisit_due(self, epoch: int) -> pa.Table | None:
        """CRAWLED rows from epoch − revisit_after_epochs, re-queued once
        per cycle (each refetch writes a new done row with a new
        fetched_epoch, so the NEXT cycle triggers off that row — periodic
        revisiting with no duplicate enqueues)."""
        cfg, ck = self.cfg, self.ck
        if cfg.revisit_after_epochs is None:
            return None
        src = epoch - cfg.revisit_after_epochs
        path = os.path.join(ck.epoch_dir(src), "done.parquet")
        if src < 0 or not os.path.exists(path):
            return None
        done_prev = pq.read_table(path)
        rev = done_prev.filter(
            pa.compute.equal(done_prev["state"], pa.scalar(S.CRAWLED, pa.uint8()))
        )
        if rev.num_rows == 0:
            return None
        rev = self._filter_rev_by_age(rev)
        if rev is None or rev.num_rows == 0:
            return None
        n = rev.num_rows
        rev = rev.set_column(
            rev.schema.get_field_index("state"),
            "state",
            pa.array(np.full(n, S.QUEUED, dtype=np.uint8)),
        )
        return rev

    def _filter_rev_by_age(self, rev: pa.Table) -> pa.Table | None:
        """Time-based revisit predicate (round-4, VERDICT r3 #7 —
        revisiting.py interval semantics over the deterministic clock):
        keep only rows whose page age = corpus max(warc_ts) − page
        warc_ts is ≥ cfg.revisit_min_age_us. The per-row warc_ts comes
        from ONE pruned broadcast-filtered scan of the pages table
        (url + warc_ts only, rows limited to the politeness-bounded due
        set) — the fetch_sim lookup pattern, nothing corpus-sized on the
        driver."""
        cfg = self.cfg
        if cfg.revisit_min_age_us is None:
            return rev
        urls_ref = ray.put(np.asarray(rev["url"].to_pylist(), dtype=object))

        def lookup(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.is_in(
                t["url"], value_set=pa.array(ray.get(urls_ref), pa.string())
            )
            return t.filter(keep)

        pages = rd.read_parquet(cfg.pages_paths, columns=["url", "warc_ts"])
        hit = pages.map_batches(lookup, batch_format="pyarrow").to_pandas()
        if hit.empty:
            return None
        now_us = int(self._pages_max_ts_us())
        # Pin the unit explicitly: pandas may coerce timestamps to ns
        # under other pandas/pyarrow versions; _pages_max_ts_us() is us.
        ts_us = (
            hit["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        stale = hit.loc[now_us - ts_us >= cfg.revisit_min_age_us, "url"]
        mask = pc.is_in(rev["url"], value_set=pa.array(stale, pa.string()))
        return rev.filter(mask)

    def _pages_max_ts_us(self) -> int:
        """Corpus max(warc_ts) in microseconds — the crawl's deterministic
        'now'. One pruned distributed scan, computed once per run."""
        if getattr(self, "_pages_now_us", None) is None:
            ds = rd.read_parquet(self.cfg.pages_paths, columns=["warc_ts"])

            def mx(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                v = pc.max(t["warc_ts"]).cast(pa.int64()).as_py()
                return pa.table({"m": pa.array([v], pa.int64())})

            parts = ds.map_batches(mx, batch_format="pyarrow").to_pandas()
            self._pages_now_us = int(parts["m"].max())
        return self._pages_now_us

    @staticmethod
    def _combine_rev(
        pending: pa.Table | None, due: pa.Table | None
    ) -> pa.Table | None:
        """Carried-over pending revisits + newly due ones, deduped on fp64
        (first occurrence wins — pending first, so a carried row keeps its
        original lineage if the same fp ever appears in both)."""
        tbls = [t for t in (pending, due) if t is not None and t.num_rows]
        if not tbls:
            return None
        t = tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)
        fps = t["fp64"].to_numpy(zero_copy_only=False)
        _, first = np.unique(fps, return_index=True)
        if len(first) < t.num_rows:
            t = t.take(pa.array(np.sort(first)))
        return t

    def _load_rev_pending(self, epoch: int) -> pa.Table | None:
        p = os.path.join(self.ck.epoch_dir(epoch), "revisit_pending.parquet")
        return pq.read_table(p) if os.path.exists(p) else None

    # -- one epoch ------------------------------------------------------
    def run_epoch(self, epoch: int, fstate: dict, rev_tbl: pa.Table | None = None) -> dict:
        """fstate: {"map": {partition: [abs queued file paths]},
        "tmap": {partition: [abs tombstone file paths]},
        "tcount": {partition: tombstoned fp count}, "queued": live row
        count} — the frontier file-map state threaded between epochs (no
        per-epoch frontier rewrite, no driver-held fp arrays)."""
        import time

        cfg, ck = self.cfg, self.ck
        counters: list[tuple[int, str, int]] = []
        stage_sec: dict[str, float] = {}
        _t = time.perf_counter
        revisited = rev_tbl.num_rows if rev_tbl is not None else 0

        t0 = _t()
        sched = schedule_files(
            fstate["map"], fstate["tmap"], rev_tbl, cfg, self.host_caps
        )
        stage_sec["schedule"] = round(_t() - t0, 3)
        if sched.empty:
            return {"scheduled": 0}
        counters += _per_partition_counts(sched, "scheduled", epoch)
        # politeness observability: distinct hosts in this epoch's batch
        dh = sched.groupby("partition")["host"].nunique()
        counters += [(int(p), "distinct_hosts", int(v)) for p, v in dh.items()]
        if revisited:
            counters.append((-1, "revisited", int(revisited)))

        # single-pass epochs (canonical store ⇒ urls unique ⇒ no dirty-
        # variant winners): the fetch chain stays LAZY and fuses with
        # write-out → extract → admit into ONE streaming execution; the
        # fetched-meta frame is read back from the (tiny columns of the)
        # out parts afterwards. The general path materializes fetch first
        # and resolves duplicate-canonical winners from one meta projection.
        single_pass = cfg.assume_canonical_pages
        t0 = _t()
        fetched_ds = fetch_sim(
            sched,
            cfg.pages_paths,
            cfg.assume_canonical_pages,
            self.pages_ds,
            materialize=not single_pass,
        )
        winners = None
        fmeta = None
        if not single_pass:
            meta = fetched_ds.select_columns(
                ["url", "raw_url", "fp64", "partition", "n_links"]
            ).to_pandas()
            if meta.empty:  # empty to_pandas may drop the schema columns
                meta = pd.DataFrame(
                    {"url": [], "raw_url": [], "fp64": [], "partition": [], "n_links": []}
                )
            winners = winner_raw_urls(meta) if len(meta) else None
            if winners is not None:
                meta = meta[meta["raw_url"].isin(winners)]
            fmeta = meta.drop(columns=["raw_url"]).reset_index(drop=True)
            stage_sec["fetch"] = round(_t() - t0, 3)

        ck.prepare(epoch)

        # out_e — text carried byte-identical (the per-row invariant) —
        # written by a PASS-THROUGH stage inside the extract pipeline below
        # (each batch writes its own out-part; one less execution barrier)
        class WriteOut:
            def __init__(self, out_dir: str, epoch: int):
                self.out_dir = out_dir
                self.epoch = epoch

            def __call__(self, b: pa.Table) -> pa.Table:
                if b.num_rows:
                    import hashlib

                    import pyarrow.parquet as _pq

                    n = b.num_rows
                    out = pa.table(
                        {
                            "url": b["url"],
                            "fp64": b["fp64"],
                            "text": b["text"],
                            "lang": b["lang"],
                            "n_links": b["n_links"],
                            "fetched_epoch": pa.array(
                                np.full(n, self.epoch, dtype=np.int32)
                            ),
                            "partition": b["partition"],
                        }
                    )
                    # content-derived part name: a Ray task RETRY re-writes
                    # the same file instead of adding a duplicate part (the
                    # single-pass fmeta read-back stays correct under retry)
                    tag = hashlib.md5(
                        b["fp64"].to_numpy(zero_copy_only=False).tobytes()
                    ).hexdigest()[:20]
                    _pq.write_table(
                        out, os.path.join(self.out_dir, f"part-{tag}.parquet")
                    )
                return b

        # link admission: ONE fused execution — write-out → extract → gate
        # → offer,
        # emitting per-batch gate-counter partials (A1 pattern; a
        # driver-side sum over tiny rows, NOT an all-to-all). Dedup +
        # seen-check happen shard-side via the offer/resolve protocol
        # (order-independent winner aggregation ⇒ deterministic).
        t0 = _t()
        ray.get(
            [
                s.begin_epoch.remote(epoch, cfg.policy, cfg.num_partitions)
                for s in self.shards
            ]
        )
        chain = fetched_ds
        if winners is not None:
            win_arr = pa.array(sorted(winners), pa.string())
            win_ref = ray.put(win_arr)

            def keep_winner(t: pa.Table) -> pa.Table:
                import pyarrow.compute as _pc

                return t.filter(_pc.is_in(t["raw_url"], value_set=ray.get(win_ref)))

            chain = chain.map_batches(keep_winner, batch_format="pyarrow")
        gate_ds = (
            chain.map_batches(
                WriteOut(ck.out_dir(epoch), epoch), batch_format="pyarrow"
            )
            .map_batches(
                ExtractAllLinks(epoch, cfg.follow_sitemaps), batch_format="pyarrow"
            )
            .map_batches(
                AdmitOfferStage(
                    cfg, self.politeness_ref, self.shards, self.strategy
                ),
                batch_format="pyarrow",
            )
        )
        gate_df = gate_ds.to_pandas()
        stage_sec["extract_admit_offer"] = round(_t() - t0, 3)
        if os.environ.get("GRAFT_STAGE_STATS") == "1":
            import sys as _sys

            print(gate_ds.stats(), file=_sys.stderr)
        if single_pass:
            # fetched-meta from the out parts this execution just wrote —
            # ONE multithreaded dataset read of the whole directory (a
            # sequential per-file loop here cost ~0.5-1 s/epoch at high
            # block counts and was pure driver-serial time)
            out_dir = ck.out_dir(epoch)
            if any(f.endswith(".parquet") for f in os.listdir(out_dir)):
                fmeta = pq.read_table(
                    out_dir, columns=["url", "fp64", "partition", "n_links"]
                ).to_pandas()
            else:
                fmeta = pd.DataFrame(
                    {"url": [], "fp64": [], "partition": [], "n_links": []}
                )
        # counter segments in canonical order: fetched/errors/extracted,
        # then the gate partials
        counters += _per_partition_counts(fmeta, "fetched", epoch)
        hit_mask = np.isin(
            sched["fp64"].to_numpy(dtype=np.uint64),
            fmeta["fp64"].to_numpy(dtype=np.uint64),
        )
        missed = sched[~hit_mask]
        counters += _per_partition_counts(missed, "errors", epoch)
        self.strategy.page_crawled(fmeta)
        if len(missed):
            self.strategy.page_error(missed)
        if not fmeta.empty:
            le = fmeta.groupby("partition")["n_links"].sum()
            counters += [(int(p), "links_extracted", int(v)) for p, v in le.items()]
        if not gate_df.empty:
            gate = gate_df[gate_df["partition"] >= 0].groupby("partition").sum()
            for p, r in gate.iterrows():
                counters.append((int(p), "links_filtered", int(r["n"] - r["ok"])))

        # ASYNC-offer barrier: the fused execution finished, but its offer
        # RPCs were fire-and-forget (they no longer block map tasks — one
        # network RTT per batch per shard on a real cluster). Resolve may
        # only run after every shard absorbed exactly the calls the gate
        # partials report submitted (>= under task retry, which re-offers
        # — same idempotence envelope as the old blocking path).
        if not gate_df.empty and "shard" in gate_df.columns:
            exp = gate_df[gate_df["shard"] >= 0].groupby("shard")["offers"].sum()
            need = {int(k): int(v) for k, v in exp.items() if v > 0}
            deadline = time.monotonic() + 300.0
            while need:
                got = ray.get(
                    [self.shards[k].offers_processed.remote() for k in need]
                )
                need = {
                    k: v for (k, v), g in zip(list(need.items()), got) if g < v
                }
                if need:
                    if time.monotonic() > deadline:
                        raise RuntimeError(
                            f"offer barrier timed out; outstanding={need}"
                        )
                    time.sleep(0.002)

        t0 = _t()
        qdir = ck.queued_dir(epoch)
        seen_dir = os.path.join(ck.epoch_dir(epoch), "seen")
        # blob cadence (VERDICT r2 #7): dump shard blobs only every N
        # epochs; skipped epochs resume by replaying their queued deltas
        every = max(1, cfg.seen_checkpoint_every)
        dump_blobs = every == 1 or (epoch + 1) % every == 0
        _seen_path = (
            (lambda k: os.path.join(seen_dir, f"shard-{k}.bin"))
            if dump_blobs
            else (lambda k: None)
        )
        resolve_futs = [
            s.resolve.remote(
                os.path.join(qdir, f"new-shard-{k}.parquet"), _seen_path(k)
            )
            for k, s in enumerate(self.shards)
        ]

        # overlap the shard resolve round with the driver-side done-delta
        # and crawl-order writes (independent work)
        done = sched.copy()
        done["state"] = np.where(hit_mask, S.CRAWLED, S.ERROR).astype(np.uint8)
        done["status_code"] = np.where(done["state"] == S.CRAWLED, 200, 404).astype(
            np.int16
        )
        done["fetched_epoch"] = np.int32(epoch)
        done_tbl = (
            pa.Table.from_pandas(
                done.drop(columns=["budget_rank"]), preserve_index=False
            )
            .select(S.FRONTIER.names)
            .cast(S.FRONTIER)
        )
        ck.write_small(epoch, "done", done_tbl)
        order = pa.table(
            {
                "seq": pa.array(
                    np.arange(self.seq, self.seq + len(sched), dtype=np.int64)
                ),
                "url": pa.array(sched["url"].to_numpy(), pa.string()),
                "epoch": pa.array([epoch] * len(sched), pa.int32()),
                "fetched": pa.array(hit_mask),
            }
        )
        self.seq += len(sched)
        ck.write_small(epoch, "crawl_order", order)

        resolves = ray.get(resolve_futs)
        if dump_blobs:
            self._seen_epoch = epoch
        stage_sec["dedup_seen"] = round(_t() - t0, 3)
        new_count = sum(r["count"] for r in resolves)
        for r in resolves:
            for p, c in r["per_partition"].items():
                counters.append((int(p), "links_queued", int(c)))

        # strategy.schedule(url, score) injections (§2.10 service parity):
        # drained once per epoch through a seeds-mode offer/resolve cycle —
        # deduped against the seen set, score taken verbatim
        injected = self.strategy.drain_injected()
        inj_res: list[dict] = []
        if injected:
            seeds_tbl = pa.table(
                {
                    "url": pa.array([u for u, _ in injected], pa.string()),
                    "score": pa.array([s for _, s in injected], pa.float64()),
                }
            )
            from ..stages.links import seeds_to_frontier

            rows = seeds_to_frontier(seeds_tbl, cfg)
            if cfg.obey_robots and rows.num_rows:
                mask = self.politeness_ref.allowed_mask(
                    rows["host"].to_pylist(), rows["url"].to_pylist()
                )
                rows = rows.filter(pa.array(mask))
            ray.get(
                [
                    s.begin_epoch.remote(epoch, cfg.policy, cfg.num_partitions, "seeds")
                    for s in self.shards
                ]
            )
            offer_seed_rows(self.shards, rows)
            inj_res = ray.get(
                [
                    s.resolve.remote(
                        os.path.join(qdir, f"inject-shard-{k}.parquet"),
                        _seen_path(k),  # overwrites the main dump → the
                        # epoch blob includes this epoch's injections
                    )
                    for k, s in enumerate(self.shards)
                ]
            )
            new_count += sum(r["count"] for r in inj_res)
            for r in inj_res:
                for p, c in r["per_partition"].items():
                    counters.append((int(p), "injected", int(c)))

        # next frontier state = files + deltas, scheduled fps tombstoned —
        # O(delta) per epoch; compaction rewrites only when tombstones
        # dominate (round-2, VERDICT #5: no full-frontier pass in the loop).
        # Round-4 (VERDICT r3 #6): tombstones persist as PER-PARTITION
        # files; the driver threads only {partition: paths} + counts
        # between epochs — its memory no longer grows with tombstones.
        t0 = _t()
        sched_fps = sched["fp64"].to_numpy(dtype=np.uint64)
        sched_parts = sched["partition"].to_numpy()
        rev_pending = None
        if revisited:
            rev_fps = rev_tbl["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
            tomb_mask = ~np.isin(sched_fps, rev_fps)
            # revisit rows cut by the per-host caps / batch cap would be
            # silently lost (they are neither in the frontier files nor
            # re-derived from a later done epoch) — carry them forward as
            # a pending table, checkpointed for exact resume
            unsched = ~np.isin(rev_fps, sched_fps)
            if unsched.any():
                rev_pending = rev_tbl.filter(pa.array(unsched))
                ck.write_small(epoch, "revisit_pending", rev_pending)
        else:
            tomb_mask = np.ones(len(sched_fps), dtype=bool)
        new_tomb_fps = sched_fps[tomb_mask]
        new_tomb_parts = sched_parts[tomb_mask]
        tmap = {p: list(files) for p, files in fstate["tmap"].items()}
        tcount = dict(fstate["tcount"])
        for p in np.unique(new_tomb_parts):
            fps_p = np.unique(new_tomb_fps[new_tomb_parts == p])
            path = ck.write_tombstones_part(epoch, int(p), fps_p)
            tmap.setdefault(int(p), []).append(path)
            tcount[int(p)] = tcount.get(int(p), 0) + len(fps_p)
        total_tomb = sum(tcount.values())
        nq_count = fstate["queued"] - len(new_tomb_fps) + new_count
        qmap = {p: list(files) for p, files in fstate["map"].items()}
        for res_list in (resolves, inj_res):
            for k, r in enumerate(res_list):
                if r["count"]:
                    qmap.setdefault(k, []).append(r["path"])
        if total_tomb and (
            total_tomb >= cfg.frontier_compact_min
            and 2 * total_tomb >= nq_count + total_tomb
        ):
            qmap = self._compact_frontier(epoch, qmap, tmap)
            tmap, tcount = {}, {}
        stage_sec["frontier_update"] = round(_t() - t0, 3)

        ck.write_small(epoch, "counters", _counters_table(epoch, counters))
        # seen blobs were written shard-side during resolve()
        ck.finish(
            epoch,
            {
                "epoch": epoch,
                "seq_next": self.seq,
                "config_fp": self._config_fingerprint(),
                "scheduled": len(sched),
                "fetched": len(fmeta),
                "errors": len(missed),
                "queued_next": int(nq_count),
                "queued_map": ck.rel_map(qmap),
                "tombstones_map": ck.rel_map(tmap),
                "tombstones_count": {str(p): int(n) for p, n in tcount.items()},
                "seen_epoch": self._seen_epoch,
                "revisit_pending": int(
                    rev_pending.num_rows if rev_pending is not None else 0
                ),
                "stage_sec": stage_sec,
            },
        )
        return {
            "scheduled": len(sched),
            "fetched": len(fmeta),
            "queued_next": nq_count,
            "stage_sec": stage_sec,
            "rev_pending": rev_pending,
            "state": {
                "map": qmap,
                "tmap": tmap,
                "tcount": tcount,
                "queued": int(nq_count),
            },
        }

    # -- frontier file-map helpers --------------------------------------
    def _frontier_state(self, epoch: int) -> dict:
        m = self.ck.load_manifest(epoch)
        tmap: dict = {}
        tcount: dict = {}
        if m.get("tombstones_map"):
            tmap = self.ck.abs_map(m["tombstones_map"])
            tcount = {int(p): int(n) for p, n in m.get("tombstones_count", {}).items()}
        elif m.get("tombstones_file"):
            # legacy single-file checkpoints: the global fp set applies to
            # every partition (a superset filter per partition is correct);
            # one bounded driver read just to recover the trigger count
            legacy = os.path.join(self.ck.root, m["tombstones_file"])
            tmap = {p: [legacy] for p in self.ck.abs_map(m.get("queued_map", {}))}
            tcount = {-1: len(self.ck.load_tombstones(m["tombstones_file"]))}
        return {
            "map": self.ck.abs_map(m.get("queued_map", {})),
            "tmap": tmap,
            "tcount": tcount,
            "queued": int(m.get("queued_next", m.get("queued", 0))),
        }

    def _compact_frontier(self, epoch: int, qmap: dict, tmap: dict) -> dict:
        """Rewrite each partition's files minus its tombstoned fps — P
        parallel tasks, one output file per partition under this epoch's
        queued dir. Each task reads its OWN partition's tombstone files."""
        qdir = self.ck.queued_dir(epoch)
        futs = {
            p: _compact_partition.remote(
                files,
                tmap.get(p, []),
                os.path.join(qdir, f"compact-{p:05d}.parquet"),
            )
            for p, files in qmap.items()
            if files
        }
        out: dict = {}
        for p, f in futs.items():
            path = ray.get(f)
            if path is not None:
                out[p] = [path]
        return out

    # -- full run -------------------------------------------------------
    def run(self, resume: bool = True) -> dict:
        cfg, ck = self.cfg, self.ck
        if cfg.cache_pages_in_memory and self.pages_ds is None:
            kw = (
                {"override_num_blocks": cfg.pages_read_blocks}
                if cfg.pages_read_blocks
                else {}
            )
            self.pages_ds = rd.read_parquet(cfg.pages_paths, **kw).materialize()
        self._build_politeness()
        if not resume:
            import shutil

            shutil.rmtree(ck.root, ignore_errors=True)
            os.makedirs(ck.root, exist_ok=True)
        latest = ck.latest_complete() if resume else None
        if latest is None:
            self._init_frontier()
            latest = -1
        else:
            self._resume_from(latest)
        summary = {"epochs": 0, "scheduled": 0, "fetched": 0}
        # wall-clock per epoch kept OFF the summary (summaries are compared
        # for determinism in tests); bench reads crawler.epoch_sec
        self.epoch_sec: list[float] = []
        # frontier state (file map + tombstones + live count) threads from
        # manifest to manifest — no per-epoch frontier read just to count
        fstate = self._frontier_state(latest)
        rev_pending = self._load_rev_pending(latest)
        for epoch in range(latest + 1, cfg.max_epochs):
            rev_tbl = self._combine_rev(rev_pending, self._revisit_due(epoch))
            n_rev = rev_tbl.num_rows if rev_tbl is not None else 0
            if fstate["queued"] == 0 and n_rev == 0:
                break
            import time as _time

            _e0 = _time.perf_counter()
            r = self.run_epoch(epoch, fstate, rev_tbl)
            if r["scheduled"] == 0:
                break
            rev_pending = r["rev_pending"]
            fstate = r["state"]
            summary["epochs"] += 1
            summary["scheduled"] += r["scheduled"]
            summary["fetched"] += r["fetched"]
            self.epoch_sec.append(round(_time.perf_counter() - _e0, 3))
        summary["seen"] = sum(ray.get([s.size.remote() for s in self.shards]))
        self.strategy.finished(summary)
        return summary

    # -- strategy services ---------------------------------------------
    def refresh_states(self, urls: list[str]) -> np.ndarray:
        """Seen-ness per url (reference BaseCrawlingStrategy.refresh_states
        analogue): enrich → route fps to their owning shard → contains()."""
        from ..stages.enrich import enrich_urls

        t = enrich_urls(
            pa.table({"url": pa.array(urls, pa.string())}), self.cfg.num_partitions
        )
        fps = t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = t["partition"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(self.shards)
        out = np.zeros(len(urls), dtype=bool)
        futs = []
        for s in np.unique(parts % k):
            idx = np.nonzero(parts % k == s)[0]
            futs.append((idx, self.shards[int(s)].contains.remote(fps[idx])))
        for idx, f in futs:
            out[idx] = ray.get(f)
        return out

    # -- parity artifacts ----------------------------------------------
    def artifacts(self) -> dict:
        """crawl_order / seen fps / out table / counters for parity checks."""
        order = self.ck.read_all("crawl_order.parquet")
        counters = self.ck.read_all("counters.parquet")
        out = self.ck.read_all_out()
        seen = np.sort(np.concatenate(ray.get([s.keys.remote() for s in self.shards])))
        return {"crawl_order": order, "counters": counters, "out": out, "seen": seen}


def run_crawl(
    cfg: CrawlConfig, resume: bool = True, strategy=None
) -> tuple[Crawler, dict]:
    c = Crawler(cfg, strategy=strategy)
    s = c.run(resume=resume)
    return c, s
