"""Crawl ordering policies + scoring — the Strategy surface.

Reference: BaseCrawlingStrategy hooks (frontera/strategy/__init__.py:
read_seeds / page_crawled / links_extracted / page_error /
filter_extracted_links / finished; approximate cites, SURVEY.md §0) and the
memory-backend ordering variants FIFO/LIFO/BFS/DFS/RANDOM
(contrib/backends/memory/__init__.py:~200-280). The reference pops from a
heap in insertion/priority order; a Ray pipeline has no global insertion
order, so each policy is expressed as a **total deterministic sort key**
over frontier columns (SURVEY.md §2.6 O4) — fp64 always breaks ties, so the
schedule is reproducible at any parallelism (hard part #1, SURVEY.md §7).

Scoring (reference: depth-based strategy frontera/strategy/depth.py —
score ≈ 1/(depth+1); OPIC per the north rule, no OPIC in core Frontera;
Abiteboul et al., "Adaptive On-Line Page Importance Computation", WWW 2003):
    basic/bfs/dfs/fifo/random : child score = 1/(depth+1)
    opic                      : child score = Σ parent_score/parent_outdeg
                                (cash split over outlinks, summed per child)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# (column, ascending) — applied in order; fp64 is always the last tiebreak.
POLICY_KEYS: dict[str, list[tuple[str, bool]]] = {
    "basic": [("score", False), ("fp64", True)],
    "opic": [("score", False), ("fp64", True)],
    "bfs": [("depth", True), ("discovered_epoch", True), ("fp64", True)],
    "dfs": [("depth", False), ("discovered_epoch", True), ("fp64", True)],
    "fifo": [("discovered_epoch", True), ("fp64", True)],
    # LIFO (reference memory-backend variant, SURVEY §2.6 O4): most recently
    # discovered first. A Ray pipeline has no per-row insertion sequence
    # (admission is an order-independent set union per epoch), so recency =
    # discovered_epoch desc with the fp64 total-order tiebreak inside an
    # epoch — the deterministic analogue of the reference's stack pop.
    "lifo": [("discovered_epoch", False), ("fp64", True)],
    "random": [("rand_key", True), ("fp64", True)],
}


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 finalizer)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def with_policy_keys(df: pd.DataFrame, policy: str, seed: int) -> pd.DataFrame:
    """Add derived key columns a policy needs (currently only random)."""
    if policy == "random":
        df = df.copy()
        df["rand_key"] = splitmix64(
            df["fp64"].to_numpy(dtype=np.uint64) ^ np.uint64(seed)
        )
    return df

def policy_sort(df: pd.DataFrame, policy: str, seed: int) -> pd.DataFrame:
    """Stable sort by the policy's total key (deterministic schedule order)."""
    df = with_policy_keys(df, policy, seed)
    cols = [c for c, _ in POLICY_KEYS[policy]]
    asc = [a for _, a in POLICY_KEYS[policy]]
    return df.sort_values(cols, ascending=asc, kind="mergesort")


def child_scores(
    policy: str,
    depth: np.ndarray,
    opic_cash_sum: np.ndarray | None = None,
) -> np.ndarray:
    """Score for newly admitted child URLs (see module docstring)."""
    if policy == "opic" and opic_cash_sum is not None:
        return opic_cash_sum.astype(np.float64)
    return 1.0 / (depth.astype(np.float64) + 1.0)


class CrawlStrategy:
    """User-extension surface — the vectorized analogue of the reference's
    BaseCrawlingStrategy hooks (frontera/strategy/__init__.py: read_seeds,
    page_crawled, links_extracted/filter_extracted_links, page_error,
    finished — approximate cites, SURVEY.md §0/§2.10). Hooks receive BATCHES
    (Arrow tables / DataFrames), never single records; override any subset.

    The object is pickled into the stages that call its hooks (AdmitLinks
    for the link filter; the driver for the rest), so implementations must
    be picklable and side-effect-free except through their return values.

    Services (reference: BaseCrawlingStrategy.schedule(request, score) /
    refresh_states — frontera/strategy/__init__.py, approx): hooks run
    driver-side and may call ``self.schedule(url, score)`` to inject URLs;
    the crawler drains the buffer each epoch and admits them through the
    seed offer/resolve path (deduped against the seen set, score taken
    verbatim). ``Crawler.refresh_states(urls)`` answers seen-ness.
    """

    def schedule(self, url: str, score: float = 1.0) -> None:
        """Inject a URL into the frontier (drained once per epoch).
        Lazy buffer: subclasses need not call super().__init__()."""
        if not hasattr(self, "_injected"):
            self._injected: list[tuple[str, float]] = []
        self._injected.append((url, float(score)))

    def drain_injected(self) -> list[tuple[str, float]]:
        out = getattr(self, "_injected", [])
        self._injected = []
        return out

    def read_seeds(self, seeds, cfg):
        """seeds: pa.Table(url, score?) → FRONTIER-shaped QUEUED rows.
        Default: enrich + score from the seed file."""
        from .stages.links import seeds_to_frontier

        return seeds_to_frontier(seeds, cfg)

    def filter_extracted_links(self, batch) -> "np.ndarray":
        """batch: enriched LINKS rows (pa.Table) → bool keep-mask, applied
        IN ADDITION to scheme/depth/robots gating. Default: keep all."""
        return np.ones(batch.num_rows, dtype=bool)

    def page_crawled(self, fetched_meta) -> None:
        """fetched_meta: driver-side DataFrame (url, fp64, partition,
        n_links) for this epoch's successful fetches."""

    def page_error(self, missed) -> None:
        """missed: driver-side DataFrame of scheduled rows the fetch
        simulator could not resolve (ERROR transitions)."""

    def finished(self, summary: dict) -> None:
        """Called once after the crawl loop exits."""
