"""Temporal joins and sessionization — the custom-operator tier the task
brief calls out (as-of join, windowed/session aggregates) expressed as
bucketed map_groups over sorted groups (ray_guide.md streaming-shaped
pattern; no event-time runtime needed because inputs are bounded tables).

Partitioning assumption (documented per the brief): both operators shuffle
by the entity key (user_id) once and sort within group by ts — at 10^10
rows the same shape holds with the key bucketed by hash and
`pd.merge_asof` / vectorized gap-cumsum per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def asof_join(sf_dir: str):
    """For each event: the most recent order of the same customer at or
    before the event time (ASOF JOIN semantics, inner). Small side
    (orders-per-user) travels with the group — ONE shuffle on user_id.

    Oracle: DuckDB `ASOF JOIN` (events.user_id = orders.o_custkey,
    events.ts >= orders.o_orderdate)."""
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = pd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    import ray

    orders_ref = ray.put(orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        od = ray.get(orders_ref)
        uid = int(g["user_id"].iloc[0])
        mine = od[od["o_custkey"] == uid]
        if mine.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "o_orderkey": []}
            ).astype({"event_id": np.int64, "user_id": np.int64, "o_orderkey": np.int64})
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        # ties on o_orderdate: ASOF picks ONE row per event — make the
        # winner deterministic and oracle-matchable by keeping the max
        # orderkey per orderdate (duckdb ASOF keeps the last by its sort)
        mine = mine.groupby("o_orderdate", as_index=False).last()
        m = pd.merge_asof(
            g,
            mine[["o_orderdate", "o_orderkey"]],
            left_on="ts",
            right_on="o_orderdate",
            direction="backward",
        )
        m = m.dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype(np.int64),
                "user_id": np.int64(uid),
                "o_orderkey": m["o_orderkey"].astype(np.int64),
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session counts per user: a new session starts when the gap since the
    previous event exceeds `gap_minutes` (classic sessionization; vectorized
    diff+cumsum per sorted group). Oracle: window lag + conditional sum."""
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values(kind="mergesort").to_numpy()
        breaks = int((np.diff(ts) > gap).sum())
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(ts)],
                "n_sessions": [breaks + 1],
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
