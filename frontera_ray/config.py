"""Crawl pipeline configuration (replaces the reference's Settings module —
frontera/settings/__init__.py + default_settings.py, ~70 knobs; approximate
cites, SURVEY.md §0). Only the knobs that matter for the Ray-Data engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field


POLICIES = ("bfs", "dfs", "basic", "opic", "fifo", "lifo", "random")


@dataclass
class CrawlConfig:
    pages_paths: list[str]              # parquet part files of the pages table
    seeds_path: str                     # parquet seed list (url, score)
    checkpoint_dir: str                 # epoch-numbered state lives here
    num_partitions: int = 4             # host shards: signed_crc32(host) % P
    # politeness (reference: get_next_requests kwargs max_requests_per_host /
    # min_hosts; MAX_NEXT_REQUESTS default 64 — core/components.py:~170)
    max_requests_per_host: int = 2      # per host per epoch
    min_hosts: int = 3                  # scheduler prefers host diversity
    max_next_requests: int = 16         # per partition per epoch
    max_epochs: int = 20
    policy: str = "bfs"
    seed: int = 42
    seen_capacity: int = 1 << 20        # per-shard cuckoo capacity
    seen_spill_threshold: int = 1 << 22  # hot-set size before freezing a run
    seen_spill_dir: str | None = None   # disk-spill sorted runs here (10^10 path)
    seen_max_resident_keys: int = 1 << 26  # per-shard RAM keys before disk spill
    # seen-blob checkpoint cadence (round-3, VERDICT r2 #7): resolve()
    # dumps each shard's full seen blob only every N epochs; at 10^10 URLs
    # that blob is GBs × shards, so per-epoch dumping dominates the epoch.
    # Resume from a non-blob epoch replays the (O(delta)) queued admission
    # deltas of the epochs since the last blob — exact by construction.
    seen_checkpoint_every: int = 1
    obey_robots: bool = True
    # Crawl-delay honoring: an epoch models this many seconds of wall time;
    # a host with Crawl-delay d gets a per-epoch cap of
    # min(max_requests_per_host, max(1, floor(epoch_seconds / d)))
    epoch_seconds: float = 60.0
    follow_sitemaps: bool = False       # also admit <loc> urls from fetched
                                        # /sitemap.xml documents (M9)
    # materialize the pages table in the object store ONCE per crawl and
    # serve every epoch's fetch (and the robots collection) from it instead
    # of re-decoding parquet per epoch. Right whenever the pages table fits
    # the cluster's aggregate object store (it stays distributed across
    # nodes); at 100 TB leave False and rely on the pruned per-epoch scan.
    cache_pages_in_memory: bool = False
    # split the pages read into this many blocks (None = one per file).
    # Zipf-skewed layouts put a hot host's whole partition in one file; at
    # high parallelism that single block straggles the fused fetch→extract
    # chain — splitting by row group rebalances it (files are written with
    # small row groups for exactly this reason).
    pages_read_blocks: int | None = None
    # pages table stores already-canonical URLs (true for production layouts
    # where the store is keyed by the frontier's canonical URL): lets the
    # fetch simulator push its URL filter into the parquet scan so
    # non-scheduled rows never enter the object store. Leave False when the
    # table may contain dirty URL variants that only match after
    # canonicalization (the conformance fixtures exercise that path).
    assume_canonical_pages: bool = False
    allowed_schemes: tuple = ("http", "https")
    max_depth: int | None = None        # optional depth cutoff
    # revisit scheduler (reference: sqlalchemy revisiting backend,
    # contrib/backends/sqlalchemy/revisiting.py:~1-120 approx — re-queue
    # CRAWLED urls after an interval; epochs are our clock)
    revisit_after_epochs: int | None = None
    # time-based revisit predicate (round-4, VERDICT r3 #7 — completes the
    # revisiting.py interval semantics): layered on the epoch cycle, only
    # rows whose page is STALE re-queue — age = corpus max(warc_ts) (the
    # deterministic "now" of a static snapshot) minus the page's warc_ts;
    # re-queue iff age >= revisit_min_age_us. None = age not consulted.
    revisit_min_age_us: int | None = None
    batch_size: int = 8192              # map_batches batch size for wide stages
    # hot-host skew handling (SURVEY.md §4 / hard part 4): split each
    # scheduler partition into `schedule_salt` sub-groups keyed by
    # hash(host) — hosts never split, so per-host budget ranks stay exact,
    # and top-N(partition) == top-N(union of sub-group top-Ns) ⇒ the
    # schedule is IDENTICAL to salt=1 (tested), just more parallel.
    schedule_salt: int = 1
    # frontier maintenance (round-2): scheduled fps accumulate as
    # tombstones; the frontier files are rewritten (compacted) only when
    # tombstones exceed this count AND half the referenced rows are dead —
    # per-epoch frontier write cost is O(delta), not O(frontier)
    frontier_compact_min: int = 1 << 20
    # seed lists at or above this row count are admitted through the
    # DISTRIBUTED Dataset offer path (below it, one driver-side offer
    # round-trip is cheaper than a Dataset execution)
    seed_driver_threshold: int = 50_000
    # politeness state placement: broadcast index (default; one ray.put) or
    # a sharded actor pool keyed host_hash % num_partitions (the scale path
    # for 10^8-host robots tables; same partitioner as the seen shards).
    politeness_actors: bool = False

    def __post_init__(self):
        if self.policy not in POLICIES:
            raise ValueError(f"unknown policy {self.policy!r}; one of {POLICIES}")
