"""Temporal joins and sessionization — the custom-operator tier the task
brief calls out (as-of join, windowed/session aggregates).

Round-2 shape (VERDICT.md #3): the entity key (user_id) is HASH-BUCKETED
into a bounded number of groups (≤ _BUCKETS — never one Python call per
user), and each bucket is processed with ONE vectorized kernel:
``pd.merge_asof(..., by=user_id)`` for the as-of join, sorted diff/cumsum
for sessions. The same shape holds at 10^10 rows: one shuffle on the
bucket key, per-bucket work linear and vectorized, the small side
(orders) shipped as one object-store ref per bucket so a group task
deserializes only its own slice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_BUCKETS = 64


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _with_bucket(ds, key: str):
    def add(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % _BUCKETS, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def asof_join(sf_dir: str):
    """For each event: the most recent order of the same customer at or
    before the event time (ASOF JOIN semantics, inner). ONE shuffle on the
    hash-bucketed user key; within each bucket a single ``pd.merge_asof``
    with ``by=`` does every user at once. The orders side is put in the
    object store pre-partitioned, ONE ref per bucket, so each group task
    fetches and deserializes only its own slice.

    Oracle: DuckDB `ASOF JOIN` (events.user_id = orders.o_custkey,
    events.ts >= orders.o_orderdate)."""
    import ray

    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = pd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
    # ties on o_orderdate: ASOF picks ONE row per event — deterministic,
    # oracle-matchable winner = max orderkey per (custkey, orderdate)
    orders = orders.groupby(["o_custkey", "o_orderdate"], as_index=False).last()
    # one object ref PER BUCKET (round-3, VERDICT r2 #9): a group task
    # deserializes only its own slice of the orders side, not the whole
    # dict of frames
    bucket_refs = {
        int(b): ray.put(g.sort_values(["o_orderdate", "o_custkey"], kind="mergesort"))
        for b, g in orders.groupby(orders["o_custkey"].to_numpy() % _BUCKETS)
    }

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": np.zeros(0, np.int64),
                "user_id": np.zeros(0, np.int64),
                "o_orderkey": np.zeros(0, np.int64),
            }
        )
        ref = bucket_refs.get(int(g["bucket"].iloc[0]))
        if ref is None:
            return empty
        od = ray.get(ref)
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        m = pd.merge_asof(
            g,
            od[["o_orderdate", "o_custkey", "o_orderkey"]],
            left_on="ts",
            right_on="o_orderdate",
            left_by="user_id",
            right_by="o_custkey",
            direction="backward",
        ).dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype(np.int64),
                "user_id": m["user_id"].astype(np.int64),
                "o_orderkey": m["o_orderkey"].astype(np.int64),
            }
        )

    return (
        _with_bucket(events, "user_id")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def funnel_counts(
    sf_dir: str, steps: tuple = ("view", "click", "purchase")
):
    """Ordered-funnel analysis: how many users reached step i, where step
    i+1 must occur STRICTLY AFTER the user's earliest qualifying step-i
    event (the classic strict-sequence funnel). One shuffle on the
    hash-bucketed user key; within a bucket every step is one filtered
    groupby-min + merge (vectorized over all users at once). Buckets emit
    per-step partial user counts; the driver sums ≤ len(steps) × buckets
    tiny rows."""
    events = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # cur: per-user timestamp of reaching the previous step
        cur = None
        out_steps, out_counts = [], []
        for i, step in enumerate(steps):
            ev = g[g["event_type"] == step]
            if cur is not None:
                ev = ev.merge(cur, on="user_id", how="inner")
                ev = ev[ev["ts"] > ev["reached_ts"]]
                ev = ev.drop(columns=["reached_ts"])
            nxt = ev.groupby("user_id", as_index=False).agg(reached_ts=("ts", "min"))
            out_steps.append(i + 1)
            out_counts.append(len(nxt))
            cur = nxt
        return pd.DataFrame(
            {
                "stage": np.asarray(out_steps, np.int64),
                "step": list(steps),
                "n_users": np.asarray(out_counts, np.int64),
            }
        )

    parts = (
        _with_bucket(events, "user_id")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    agg = (
        parts.groupby(["stage", "step"], as_index=False)["n_users"]
        .sum()
        .sort_values("stage", kind="mergesort")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "stage": pa.array(agg["stage"].to_numpy(), pa.int64()),
            "step": pa.array(agg["step"].tolist(), pa.string()),
            "n_users": pa.array(agg["n_users"].to_numpy(), pa.int64()),
        }
    )


def retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by the DAY of their first
    event (epoch-day int — date dtypes don't hash stably across engines),
    counted once per (cohort, day-offset) they were active. Because a user
    lives in exactly one hash bucket, the per-bucket distinct
    (user, cohort, offset) triples are globally distinct, so buckets emit
    exact partial counts and ONE tiny groupby sums them — the full events
    table is never re-shuffled on the cohort key."""
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day})
        cohort = df.groupby("user_id")["day"].transform("min")
        df["cohort_day"] = cohort
        df["day_offset"] = df["day"] - cohort
        uniq = df[["user_id", "cohort_day", "day_offset"]].drop_duplicates()
        cnt = uniq.groupby(["cohort_day", "day_offset"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        return pd.DataFrame(
            {
                "cohort_day": cnt["cohort_day"].to_numpy().astype(np.int64),
                "day_offset": cnt["day_offset"].to_numpy().astype(np.int64),
                "n_users": cnt["n_users"].to_numpy().astype(np.int64),
            }
        )

    # partials are bounded by cohorts × offsets (≤ T² for a T-day log),
    # not by event rows — a driver-side merge of the tiny per-bucket
    # frames beats a second sort shuffle (measured ~1 s of pure
    # small-block Aggregate overhead at sf0.1)
    parts = (
        _with_bucket(events, "user_id")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"].sum()
    return pa.table(
        {
            "cohort_day": pa.array(agg["cohort_day"].to_numpy(), pa.int64()),
            "day_offset": pa.array(agg["day_offset"].to_numpy(), pa.int64()),
            "n_users": pa.array(agg["n_users"].to_numpy(), pa.int64()),
        }
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session counts per user: a new session starts when the gap since the
    previous event exceeds `gap_minutes` (classic sessionization). One
    shuffle on the hash-bucketed user key; within each bucket the whole
    computation is a sorted diff over (user_id, ts) + two groupby
    aggregations — no per-user Python. Oracle: window lag + conditional sum."""
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        same_user = np.zeros(len(g), dtype=bool)
        same_user[1:] = uid[1:] == uid[:-1]
        brk = np.zeros(len(g), dtype=np.int64)
        brk[1:] = ((ts[1:] - ts[:-1]) > gap).astype(np.int64)
        brk[~same_user] = 0
        out = pd.DataFrame({"user_id": uid, "brk": brk})
        agg = out.groupby("user_id", sort=True).agg(
            n_events=("brk", "size"), breaks=("brk", "sum")
        )
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy().astype(np.int64),
                "n_events": agg["n_events"].to_numpy().astype(np.int64),
                "n_sessions": (agg["breaks"] + 1).to_numpy().astype(np.int64),
            }
        )

    return (
        _with_bucket(events, "user_id")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def interarrival_stats(sf_dir: str):
    """Per-user inter-arrival gap statistics in event-time order (the
    cadence/burstiness primitive of behavioral analytics): for each user
    with ≥ 2 events, the count, sum, min and max of consecutive-event
    gaps in microseconds. Distributed shape: ONE shuffle on the
    hash-bucketed user key (all of a user's events share a bucket), one
    vectorized sorted-diff per bucket — no per-user Python. Gaps are
    int64 microseconds end to end, so every aggregate is integer-exact
    vs the lag()-window oracle (epoch_us both sides)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = uid[1:] == uid[:-1]
        gaps = pd.DataFrame(
            {"user_id": uid[1:][same], "gap_us": ts[1:][same] - ts[:-1][same]}
        )
        if gaps.empty:
            return pd.DataFrame(
                {
                    "user_id": np.zeros(0, np.int64),
                    "n_gaps": np.zeros(0, np.int64),
                    "sum_gap_us": np.zeros(0, np.int64),
                    "min_gap_us": np.zeros(0, np.int64),
                    "max_gap_us": np.zeros(0, np.int64),
                }
            )
        agg = gaps.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_us", "size"),
            sum_gap_us=("gap_us", "sum"),
            min_gap_us=("gap_us", "min"),
            max_gap_us=("gap_us", "max"),
        )
        return agg.astype(
            {
                "user_id": np.int64,
                "n_gaps": np.int64,
                "sum_gap_us": np.int64,
                "min_gap_us": np.int64,
                "max_gap_us": np.int64,
            }
        )

    return (
        _with_bucket(ds, "user_id")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def weekday_activity(sf_dir: str):
    """Per (event_type, weekday) event count and value mass — the
    day-of-week load profile every event pipeline wants. Weekday is pure
    int64 arithmetic on the epoch-µs timestamp
    (((us // 86_400e6) + 4) % 7 — 1970-01-01 was a Thursday, matching
    DuckDB dayofweek()'s Sunday=0 convention for non-negative epochs), so
    each block collapses to ≤ |types|×7 partial rows via one vectorized
    groupby; the driver merges the bounded partials. No shuffle at all.

    Integer-exact export: value_e4 sums per-ROW floor(value*1e4 + 0.5)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_type", "ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(
            np.int64
        )
        dow = ((us // 86_400_000_000) + 4) % 7
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "dow": dow,
                "value_e4": np.floor(v * 10_000 + 0.5).astype(np.int64),
            }
        )
        g = df.groupby(["event_type", "dow"], sort=False, as_index=False).agg(
            n=("value_e4", "size"), value_e4=("value_e4", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded: ≤ |types|×7 rows per block reach the driver
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["event_type", "dow"], as_index=False).agg(
        n=("n", "sum"), value_e4=("value_e4", "sum")
    )
    agg = agg.sort_values(["event_type", "dow"], kind="mergesort").reset_index(
        drop=True
    )
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "dow": pa.array(agg["dow"].astype(np.int64).to_numpy(), pa.int64()),
            "n": pa.array(agg["n"].astype(np.int64).to_numpy(), pa.int64()),
            "value_e4": pa.array(
                agg["value_e4"].astype(np.int64).to_numpy(), pa.int64()
            ),
        }
    )


def hourly_load(sf_dir: str):
    """Per (event_type, hour-of-day) event counts — the diurnal load
    histogram. hour = (us // 3600e6) % 24 (matches DuckDB hour() for
    non-negative epochs); each block collapses to ≤ |types|×24 partial
    rows, driver merges. No shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(
            np.int64
        )
        hour = (us // 3_600_000_000) % 24
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "hour": hour})
        g = df.groupby(["event_type", "hour"], sort=False, as_index=False).agg(
            n=("hour", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded: ≤ |types|×24 rows per block reach the driver
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["event_type", "hour"], as_index=False)["n"].sum()
    agg = agg.sort_values(["event_type", "hour"], kind="mergesort").reset_index(
        drop=True
    )
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "hour": pa.array(agg["hour"].astype(np.int64).to_numpy(), pa.int64()),
            "n": pa.array(agg["n"].astype(np.int64).to_numpy(), pa.int64()),
        }
    )
