"""Relational operator pipelines over the driver testdata tables —
the SQL-expressible slice of SURVEY.md §2 (groupby-agg A1/A2, top-k O1-O3,
hash join J1, semi-join J3, distinct A4, windows §2.9), each with a DuckDB
oracle in __ray_entry__.oracle_sql().

Conventions that keep the driver's value-hash compare stable:
* every aggregate / computed column has the SAME name as in the oracle SQL
* float aggregates are exported as SCALED BIGINTs — floor(x*scale + 0.5),
  identical formula in the SQL — because a float rounded to 2dp still
  differs between engines in the last ulp and would break a value-hash
* every result has a deterministic content, never a deterministic row order
  requirement (the driver sorts before hashing)

Scale notes are per function; inputs are read with column pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def scale_int(t: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Replace float columns by floor(x*scale + 0.5) BIGINTs (SQL mirror:
    CAST(floor(x*scale + 0.5) AS BIGINT))."""
    for col, s in cols.items():
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.floor(x * s + 0.5).astype(np.int64)
        t = t.set_column(t.schema.get_field_index(col), col, pa.array(v, pa.int64()))
    return t


def row_scaled_int(arr, scale: int) -> pa.Array:
    """Per-ROW floor(x*scale + 0.5) as int64 (round-4 integer-exact export
    discipline): summing engines then add identical int64s, so the result
    is order-independent at any scale and block layout — unlike
    sum-then-floor, which sits one ulp from a rounding boundary (observed
    flipping at sf0.1 volumes). SQL mirror:
    sum(CAST(floor(x*scale + 0.5) AS BIGINT))."""
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(np.floor(x * scale + 0.5).astype(np.int64), pa.int64())


def _int_avg(t: pa.Table, sum_col: str, n_col: str, out_col: str) -> pa.Table:
    """floor(int_sum / n + 0.5) — deterministic IEEE division of two exact
    ints; mirrors SQL floor(sum(...) * 1.0 / count(*) + 0.5)."""
    s = t[sum_col].to_numpy(zero_copy_only=False).astype(np.float64)
    n = t[n_col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = np.floor(s * 1.0 / n + 0.5).astype(np.int64)
    idx = t.schema.get_field_index(sum_col)
    t = t.remove_column(idx)
    return t.append_column(out_col, pa.array(v, pa.int64()))


def groupby_agg(sf_dir: str):
    """Per-event-type counters (A1 stats-counter pattern: one small shuffle
    after Arrow-native partial aggregation inside Ray's groupby). Exports
    are integer-exact: per-row e4 ints summed, avg = floor(sum/n + 0.5)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "value_e4": row_scaled_int(t["value"], 10_000)}
        ),
        batch_format="pyarrow",
    )
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value_e4", alias_name="sum_value_e4"),
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = np.floor(
            t["sum_value_e4"].to_numpy(zero_copy_only=False).astype(np.float64)
            / t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            + 0.5
        ).astype(np.int64)
        return t.append_column("avg_value_e4", pa.array(avg, pa.int64()))

    return out.map_batches(finish, batch_format="pyarrow")


def filter_topk(sf_dir: str):
    """Global top-k (O1/O2): filter + sort + limit. The sort is distributed
    (range-partitioned); only k rows reach the driver."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).drop_columns(
            ["o_orderstatus"]
        ),
        batch_format="pyarrow",
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)


def hash_join_agg(sf_dir: str, broadcast_limit: int | None = None):
    """orders ⋈ customer ⋈ nation → per-nation order stats (J1 broadcast
    join: customer & nation are small dimension sides, loaded once and merged
    per batch — no shuffle; the reference-scale analogue broadcasts via
    ray.put and at 100 TB the big side streams through map_batches).

    broadcast_limit (round-3): when the dimension side exceeds this row
    count it is no longer a valid broadcast — the join switches to the
    generic co-partitioned hash_shuffle_join (tested identical)."""
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ]
    import ray

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    if broadcast_limit is not None and len(dim) > broadcast_limit:
        dim_ds = rd.from_arrow(pa.Table.from_pandas(dim, preserve_index=False))
        joined = hash_shuffle_join(
            ds, dim_ds, "o_custkey", "c_custkey", n_routes=auto_routes(ds, dim_ds)
        ).select_columns(["n_name", "o_totalprice"])
    else:
        dim_ref = ray.put(dim)

        def join(batch: pd.DataFrame) -> pd.DataFrame:
            d = ray.get(dim_ref)
            return batch.merge(d, left_on="o_custkey", right_on="c_custkey")[
                ["n_name", "o_totalprice"]
            ]

        joined = ds.map_batches(join, batch_format="pandas")

    # combiner: ≤25 partial rows per block into the final groupby (the
    # row-level Aggregate pays ~1 s/task of shuffle overhead otherwise).
    # Per-row floor to integer cents first (round-4 exact-export rule).
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        out = pd.DataFrame({"n_name": df["n_name"], "cents": cents})
        return out.groupby("n_name", as_index=False).agg(
            n_orders=("cents", "size"), cents=("cents", "sum")
        )

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("cents", alias_name="sum_total_cents"),
        )
    )


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (vectorized Arrow compute kernels,
    column-pruned read with row filtering)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        # per-ROW integer exports (round-4 exact-export rule): engines
        # then sum identical int64s in any order. round-5: within-batch
        # combiner — the (flag, status) key space is ~6, so ≤ 6 rows per
        # block reach the driver and the merge needs NO shuffle at all
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1997-09-01", "us"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
                "l_linestatus": t["l_linestatus"].to_numpy(zero_copy_only=False),
                "qty_i": row_scaled_int(t["l_quantity"], 1).to_numpy(
                    zero_copy_only=False
                ),
                "cents": row_scaled_int(t["l_extendedprice"], 100).to_numpy(
                    zero_copy_only=False
                ),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False),
                "disc_e6": row_scaled_int(t["l_discount"], 1_000_000).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False).agg(
            sum_qty=("qty_i", "sum"),
            sum_base_price_cents=("cents", "sum"),
            sum_disc_price_e4=("rev_e4", "sum"),
            disc_e6_sum=("disc_e6", "sum"),
            count_order=("qty_i", "size"),
        )
        g["count_order"] = g["count_order"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded driver merge: ≤ 6 tiny partial rows per block
    parts = ds.map_batches(prep, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
    agg = agg.sort_values(["l_returnflag", "l_linestatus"], kind="mergesort")
    # avg of the e6-rounded discounts: floor(int_sum / n + 0.5)
    avg = np.floor(
        agg["disc_e6_sum"].to_numpy(np.float64)
        * 1.0
        / agg["count_order"].to_numpy(np.float64)
        + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "l_returnflag": pa.array(agg["l_returnflag"].tolist(), pa.string()),
            "l_linestatus": pa.array(agg["l_linestatus"].tolist(), pa.string()),
            "sum_qty": pa.array(agg["sum_qty"].to_numpy(np.int64), pa.int64()),
            "sum_base_price_cents": pa.array(
                agg["sum_base_price_cents"].to_numpy(np.int64), pa.int64()
            ),
            "sum_disc_price_e4": pa.array(
                agg["sum_disc_price_e4"].to_numpy(np.int64), pa.int64()
            ),
            "count_order": pa.array(agg["count_order"].to_numpy(np.int64), pa.int64()),
            "avg_disc_e6": pa.array(avg, pa.int64()),
        }
    )


def distinct_pairs(sf_dir: str):
    """DISTINCT (A4) over two columns whose value space is BOUNDED:
    per-batch dedup (≤ |langs|·|sources| rows per block) + driver-side
    dedup of the tiny partials — no shuffle. The unbounded-distinct
    shape (hash-key groupby) lives in exact_dedup."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "source"])

    def dp(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_numpy(zero_copy_only=False),
                "source": t["source"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(dp, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
        .sort_values(["lang", "source"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"].tolist(), pa.string()),
            "source": pa.array(out["source"].tolist(), pa.string()),
        }
    )


def window_tumbling(sf_dir: str):
    """Tumbling 1-hour window per user (SURVEY.md §2.9 streaming semantics →
    groupby(key, window_bucket) — event-time bucketing is a vectorized
    column computation, the shuffle is on the (user, window) pair)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    from ..strategy import splitmix64

    n_routes = auto_routes(ds)

    def bucket(t: pa.Table) -> pa.Table:
        # cast back to us: floor_temporal narrows the unit, and the oracle
        # (DuckDB date_trunc) stays timestamp[us]; value exported as
        # per-row e4 ints (round-4 exact-export rule). round-5: within-
        # batch combiner + splitmix route — the exchange ships one row
        # per (user, window) per block, and the final sums run inside a
        # route group (a user's partials are complete there), not Ray's
        # sort-aggregate
        ws = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us"))
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "window_start": ws.to_numpy(zero_copy_only=False),
                "value_e4": row_scaled_int(t["value"], 10_000).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby(["user_id", "window_start"], sort=False, as_index=False).agg(
            n=("value_e4", "size"), value_e4=("value_e4", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        g["route"] = (
            splitmix64(g["user_id"].to_numpy(np.int64).view(np.uint64))
            % np.uint64(n_routes)
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "window_start"], sort=False, as_index=False).agg(
            n=("n", "sum"), sum_value_e4=("value_e4", "sum")
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("route")
        .map_groups(group_fn, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.select(
            ["user_id", "window_start", "n", "sum_value_e4"]
        ).set_column(1, "window_start", pc.cast(t["window_start"], pa.timestamp("us")))

    return out.map_batches(finish, batch_format="pyarrow")


def topk_per_key(sf_dir: str):
    """Per-key top-k (O1/O3 scheduler kernel shape): groupby(event_type) →
    rank within group by (value desc, event_id asc), keep k=3."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_type", "event_id", "value"]
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ascending=[False, True], kind="mergesort")
        g = g.head(3).copy()
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby("event_type").map_groups(topk, batch_format="pandas")


def semi_join(sf_dir: str):
    """Semi-join (J3): events whose user is a high-balance customer.
    Small side → broadcast key set, filter inside map_batches (no shuffle)."""
    import ray

    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
    keys = np.sort(cust.loc[cust["c_acctbal"] > 5000, "c_custkey"].to_numpy())
    keys_ref = ray.put(keys)

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "value"])

    def keep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(np.isin(uid, ray.get(keys_ref))))
        # per-row e4 ints (round-4 exact-export rule), combined to
        # ≤ |event types| partial rows per block (round-5: the tiny
        # merge needs no shuffle — the pricing_summary move)
        df = pd.DataFrame(
            {
                "event_type": sub["event_type"].to_numpy(zero_copy_only=False),
                "value_e4": row_scaled_int(sub["value"], 10_000).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby("event_type", sort=False, as_index=False).agg(
            n=("value_e4", "size"), sum_value_e4=("value_e4", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_value_e4=("sum_value_e4", "sum")
    )
    agg = agg.sort_values("event_type", kind="mergesort").reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "sum_value_e4": pa.array(
                agg["sum_value_e4"].to_numpy(np.int64), pa.int64()
            ),
        }
    )


def schedule_topk(sf_dir: str):
    """The crawl scheduler kernel, oracle-checked in SQL: treat documents as
    a frontier (host=source, score=n_chars, id=doc_id); per-host budget rank
    < 2 by (score desc, id asc); global order (rank, score desc, id) LIMIT
    100 — exactly stages/schedule.py semantics on one partition."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True], kind="mergesort")
        g = g.copy()
        g["budget_rank"] = np.arange(len(g), dtype=np.int64)
        return g[g["budget_rank"] < 2]

    ranked = ds.groupby("source").map_groups(rank, batch_format="pandas")
    df = ranked.to_pandas()  # bounded: ≤ 2 rows per host
    df = df.sort_values(
        ["budget_rank", "n_chars", "doc_id"], ascending=[True, False, True], kind="mergesort"
    ).head(100)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def url_fingerprint(sf_dir: str):
    """M1+M2 canonicalize+fingerprint kernel, oracle-checked via DuckDB md5:
    synthesize a URL per document, canonicalize, md5 it (the engine's sha1
    path is golden-tested in pytest; md5 is what the oracle can compute)."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def fp(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"].to_pylist()
        src = t["source"].to_pylist()
        urls = [f"http://{s}.test/doc/{d}" for s, d in zip(src, doc_id)]
        md5s = [hashlib.md5(u.encode()).hexdigest() for u in urls]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(urls, pa.string()),
                "fp_md5": pa.array(md5s, pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------- round 3 --
def _neutral_fill(n: int, typ: pa.DataType) -> pa.Array:
    """Type-appropriate filler for the absent side's columns in the tagged
    union (values are never read — the merge kernel splits by side first).
    Neutral non-null fills keep pandas dtypes native through the groupby
    (a null int column would coerce to float64 and corrupt the output
    dtype)."""
    if pa.types.is_integer(typ):
        return pa.array(np.zeros(n, dtype=np.int64)).cast(typ)
    if pa.types.is_floating(typ):
        return pa.array(np.zeros(n, dtype=np.float64)).cast(typ)
    if pa.types.is_timestamp(typ):
        return pa.array(np.zeros(n, dtype="datetime64[us]")).cast(typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n).cast(typ)
    return pa.nulls(n, typ)


_ROUTE_TARGET_BYTES = 384 << 20  # mid of the 256-512 MB/group envelope
_ROUTE_MIN = 16  # parallelism floor so the map side never serializes
_ROUTE_MAX = 1 << 19  # sanity cap ABOVE the design point: 100 TB through
# one exchange needs ceil(100 TB / 384 MB) ≈ 2.7e5 route groups, and the
# group count must win over the heap envelope (a bound cap would silently
# inflate groups past 512 MB). ~5e5 map_groups tasks is scheduler-fine on
# a 256-node cluster; inputs past ~192 TB/exchange would need a re-think
# anyway (multi-level exchange), so the cap only guards absurd estimates.


def auto_routes(
    *source_datasets,
    lo: int = _ROUTE_MIN,
    hi: int = _ROUTE_MAX,
    target_bytes: int = _ROUTE_TARGET_BYTES,
) -> int:
    """Size a co-partitioned exchange's route count from its SOURCE
    scans' parquet metadata — `Dataset.size_bytes()` on a `read_parquet`
    root is a free in-memory estimate (no execution). One route group
    materializes ~total_bytes / n_routes in a single map_groups task, so
    pick n_routes such that a group fits the 256-512 MB worker-heap
    envelope documented on hash_shuffle_join. Downstream filters and
    projections only SHRINK groups, so sizing from the unfiltered scans
    is upper-bound-safe. At test scale this lands at `lo` (per-task
    fixed overhead dominates — measured 1.4-2.3x faster than 64 routes
    at sf0.1); at 100 TB it lands in the thousands. Pass the raw
    `read_parquet` datasets BEFORE map_batches — size_bytes() on a
    mapped dataset would trigger execution."""
    total = 0
    for ds in source_datasets:
        try:
            total += int(ds.size_bytes() or 0)
        except Exception:
            total += target_bytes * 64  # unknown side: assume wide
    return max(lo, min(hi, -(-total // target_bytes)))


def hash_shuffle_join(
    left_ds, right_ds, left_key: str, right_key: str, n_routes: int = 64,
    post=None,
):
    """Generic co-partitioned hash join for two LARGE sides — the J1
    fallback SURVEY.md §2.4 names for when the small-side broadcast
    assumption breaks (a fact ⋈ fact join at 100 TB has no broadcast
    side). Shape:

      each side tagged (side, jkey, route = splitmix64(key) % n_routes)
        → union (one schema: left cols + right cols, absent side filled
          with unread neutral values so dtypes survive pandas)
        → groupby(route).map_groups: ONE vectorized pd.merge per route
          group (bounded cardinality — never one call per key)

    Inner join; key columns must be integer; non-key column names must be
    disjoint. Returns a Dataset with left columns then right columns
    (right key dropped). Both sides stream — nothing is collected to the
    driver and neither side is replicated.

    `post` (optional, DataFrame → DataFrame) runs on each route group's
    merged frame INSIDE the same map_groups. Because routing hashes the
    join key, every key's rows are complete within its group, so a
    per-key aggregate here is exact — consumers that would otherwise
    follow the join with groupby(key).aggregate() can fold it into the
    join and skip that second all-to-all entirely.

    Partitioning envelope (SIZE, not just cardinality): map_groups
    materializes one route group as one pandas frame, i.e. ~1/n_routes
    of (left + right) bytes per task. The default 64 suits the test
    scales; at production scale size n_routes ≈ total_join_bytes /
    (256–512 MB) so a group fits a worker heap — routing is
    splitmix64-uniform, so groups balance; only per-KEY skew (one hot
    join key) needs salting upstream. n_routes is a pure partitioning
    knob: results are identical at any value (tested)."""
    from ..strategy import splitmix64

    lschema, rschema = left_ds.schema(), right_ds.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != right_key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision between join sides: {overlap}")
    # the tag stage adds route/side/jkey; an input carrying one of those
    # names would silently overwrite the tags and corrupt routing
    reserved = {"route", "side", "jkey"} & (set(lschema.names) | set(rschema.names))
    if reserved:
        raise ValueError(f"input columns collide with reserved tag columns: {reserved}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def tag(side: int, key_col: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            route = (
                splitmix64(key.view(np.uint64)) % np.uint64(n_routes)
            ).astype(np.int64)
            cols: dict = {
                "route": pa.array(route, pa.int64()),
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "jkey": pa.array(key, pa.int64()),
            }
            for c in lcols:
                cols[c] = t[c] if side == 0 else _neutral_fill(n, ltypes[c])
            for c in rcols:
                cols[c] = t[c] if side == 1 else _neutral_fill(n, rtypes[c])
            return pa.table(cols)

        return f

    # repartition after union: Ray's sort planner collapses a unioned
    # input to ONE SortMap task (measured 3-7x slower end-to-end); a
    # metadata-level repartition (no all-to-all) restores sort parallelism
    unioned = (
        left_ds.map_batches(tag(0, left_key), batch_format="pyarrow")
        .union(right_ds.map_batches(tag(1, right_key), batch_format="pyarrow"))
        .repartition(n_routes * 2)
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["side"] == 0, lcols]
        r = g.loc[g["side"] == 1, rcols + ["jkey"]]
        out = l.merge(r, left_on=left_key, right_on="jkey").drop(columns=["jkey"])
        return post(out) if post is not None else out

    return unioned.groupby("route").map_groups(merge, batch_format="pandas")


def shuffle_join(sf_dir: str):
    """Headline large×large join: lineitem ⋈ orders on the order key with
    NO broadcast side (both fact-sized at 100 TB), via the generic
    co-partitioned hash_shuffle_join, then a tiny per-priority aggregate.
    Oracle: plain SQL inner join + GROUP BY."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev(t: pa.Table) -> pa.Table:
        # per-ROW floor to integer e4 units BEFORE any sum (round-4): the
        # engines then add identical int64s in any order — the old
        # sum-then-floor export flipped a ulp at sf0.1 volumes. The per-row
        # product is one identical IEEE multiply on both sides.
        r = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        e4 = np.floor(r * 10_000 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue_e4": pa.array(e4, pa.int64()),
            }
        )

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    nr = auto_routes(li, orders)
    li = li.map_batches(rev, batch_format="pyarrow")

    # combiner (A1 pattern) folded into the join's route groups (post=,
    # round 5): each group emits ≤5 partial rows, so the full joined
    # table never lands in the object store — measured: the row-level
    # Aggregate here burned 140+ s of remote time
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_items=("revenue_e4", "size"), revenue_e4=("revenue_e4", "sum")
        )
        return g

    joined = hash_shuffle_join(
        li, orders, "l_orderkey", "o_orderkey", n_routes=nr, post=partial
    )

    # ≤5 partial rows per group → a driver merge of the tiny frames beats
    # a second Dataset sort-shuffle (round-4, same move as star_join)
    partials = joined.to_pandas()
    agg = partials.groupby("o_orderpriority", as_index=False).agg(
        n_items=("n_items", "sum"), sum_revenue_e4=("revenue_e4", "sum")
    )
    agg = agg.sort_values("o_orderpriority", kind="mergesort").reset_index(drop=True)
    agg = agg.astype({"n_items": np.int64, "sum_revenue_e4": np.int64})
    return pa.Table.from_pandas(agg, preserve_index=False)


# ---------------------------------------------------------------- round 2 --
def anti_join(sf_dir: str):
    """Customers with NO events, counted per nation (anti-join J-family).
    The distinct order-custkey set is computed distributed (map_batches
    partial unique → driver union — keys only, never rows) and broadcast;
    the probe side streams. At 10^10 rows the same op hash-buckets both
    sides on the key instead (documented alternative); the broadcast form
    is right whenever the key set fits one node, as here."""
    import ray

    events = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    parts = events.map_batches(
        lambda t: pa.table(
            {"k": pa.array(np.unique(t["user_id"].to_numpy(zero_copy_only=False)))}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    have = np.unique(parts["k"].to_numpy())
    have_ref = ray.put(have)
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    def keep_orderless(t: pa.Table) -> pa.Table:
        # per-batch partial: filter + per-nation bincount (≤ |nations|
        # rows per block) — the tiny merge needs no shuffle (round-5,
        # the pricing_summary move)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(~np.isin(keys, ray.get(have_ref))))
        nk = sub["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(nk, return_counts=True)
        return pa.table(
            {
                "c_nationkey": pa.array(vals.astype(np.int32), pa.int32()),
                "n_no_orders": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    out = (
        cust.map_batches(keep_orderless, batch_format="pyarrow")
        .to_pandas()  # ≤ #nations × #blocks tiny partial rows
        .groupby("c_nationkey", as_index=False)["n_no_orders"]
        .sum()
    )
    return pa.table(
        {
            "c_nationkey": pa.array(
                out.get("c_nationkey", pd.Series(dtype=np.int32)), pa.int32()
            ),
            "n_no_orders": pa.array(
                out.get("n_no_orders", pd.Series(dtype=np.int64)), pa.int64()
            ),
        }
    )


def quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (p50/p90) of event value —
    DuckDB quantile_disc semantics: sorted[ceil(q*n) - 1]. Group count is
    tiny (event types), so ONE map_groups per type sorts its slice; the
    scale path for high-cardinality groups is a distributed sort +
    per-group rank select (same kernel, range-partitioned)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        n = len(v)
        pick = lambda qq: v[int(np.ceil(qq * n)) - 1]
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [n],
                "p50_e4": [int(np.floor(pick(0.5) * 10_000 + 0.5))],
                "p90_e4": [int(np.floor(pick(0.9) * 10_000 + 0.5))],
            }
        )

    return ds.groupby("event_type").map_groups(q, batch_format="pandas")


def star_join_revenue(sf_dir: str):
    """Star join (TPC-H Q9 flavor): lineitem ⋈ part ⋈ supplier ⋈ nation →
    revenue per (brand, nation). BOTH dimension sides are broadcast once
    via ray.put as decoded dense-key lookup arrays (classic star-schema
    shape: fact streams, dims are small everywhere); each batch gathers
    both dims with np.take and collapses to per-group partials via
    bincount. The driver merges only the partials —
    O(brands × nations × blocks) scalar rows, never fact rows (round-4:
    this replaced a second Dataset sort-shuffle, 10× at sf0.1)."""
    import ray

    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    supp = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ]
    # round-4: broadcast DECODED lookup arrays instead of DataFrames —
    # the per-batch "join" becomes two np.take gathers + one bincount per
    # measure (dim keys are dense ints, the star-schema invariant). Per
    # group, additions still run in fact-row order (bincount accumulates
    # sequentially), the same order the per-batch pandas groupby summed.
    brand_codes, brand_names = pd.factorize(part["p_brand"], sort=True)
    brand_by_key = np.full(int(part["p_partkey"].max()) + 1, -1, np.int64)
    brand_by_key[part["p_partkey"].to_numpy(np.int64)] = brand_codes
    nat_codes, nat_names = pd.factorize(supp["n_name"], sort=True)
    nat_by_key = np.full(int(supp["s_suppkey"].max()) + 1, -1, np.int64)
    nat_by_key[supp["s_suppkey"].to_numpy(np.int64)] = nat_codes
    nb, nn = len(brand_names), len(nat_names)
    lk_ref = ray.put((brand_by_key, nat_by_key, list(brand_names), list(nat_names)))

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def join_partial(df: pd.DataFrame) -> pd.DataFrame:
        b_by_key, n_by_key, b_names, n_names = ray.get(lk_ref)
        pk = df["l_partkey"].to_numpy(np.int64)
        sk = df["l_suppkey"].to_numpy(np.int64)
        # bounds-mask BEFORE indexing: an out-of-range fact key (dirty
        # FK) must behave as an inner-join drop, not IndexError / wrap
        pk_ok = (pk >= 0) & (pk < len(b_by_key))
        sk_ok = (sk >= 0) & (sk < len(n_by_key))
        bc = np.where(pk_ok, b_by_key[np.where(pk_ok, pk, 0)], -1)
        nc = np.where(sk_ok, n_by_key[np.where(sk_ok, sk, 0)], -1)
        keep = (bc >= 0) & (nc >= 0)  # inner-join semantics
        bc, nc = bc[keep], nc[keep]
        # per-ROW floor to integer e4 units BEFORE summing (round-4):
        # engines add identical int64s in any order — order-independent,
        # exact at every scale (the sum-then-floor export is ulp-fragile)
        r = (
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
        )[keep]
        rev_e4 = np.floor(r * 10_000 + 0.5)
        cell = bc * nn + nc
        cnt = np.bincount(cell, minlength=nb * nn)
        # bincount weights sum in float64; integer-valued weights stay
        # exact while rows_per_block × max_rev_e4 < 2^53 (real block
        # sizes are orders of magnitude inside that envelope)
        rev = np.bincount(cell, weights=rev_e4, minlength=nb * nn)
        present = np.flatnonzero(cnt)
        return pd.DataFrame(
            {
                "p_brand": [b_names[i // nn] for i in present],
                "n_name": [n_names[i % nn] for i in present],
                "n_items": cnt[present].astype(np.int64),
                "revenue_e4": rev[present].astype(np.int64),
            }
        )

    # partials are bounded (≤ brands × nations rows per block), so a tiny
    # driver-side merge beats a second Dataset sort-shuffle outright (the
    # PLAN_r3 gotcha: a row-level groupby().aggregate() fed by many small
    # blocks pays ~1 s/task of shuffle machinery regardless of row count)
    partials = ds.map_batches(join_partial, batch_format="pandas").to_pandas()
    agg = partials.groupby(["p_brand", "n_name"], as_index=False).agg(
        n_items=("n_items", "sum"), sum_revenue_e4=("revenue_e4", "sum")
    )
    agg = agg.sort_values(["p_brand", "n_name"], kind="mergesort").reset_index(drop=True)
    agg = agg.astype({"n_items": np.int64, "sum_revenue_e4": np.int64})
    return pa.Table.from_pandas(agg, preserve_index=False)


def ntile_quartiles(sf_dir: str, n_tiles: int = 4):
    """SQL ntile() window function (round-4): assign each event its
    quartile within its event_type by (value, event_id) total order.
    Standard ntile sizing — the first (n mod k) tiles get the extra row.
    Distributed shape: groupby(event_type).map_groups with a vectorized
    rank inside — group cardinality = event-type cardinality (bounded);
    a high-cardinality partition key would use the route-group pattern
    instead. Integer output → exact vs the DuckDB ntile() oracle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    k = n_tiles

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], kind="mergesort")
        n = len(g)
        base, rem = divmod(n, k)
        sizes = np.full(min(k, n), base, dtype=np.int64)
        sizes[:rem] += 1
        sizes = sizes[sizes > 0]
        tile = np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64), sizes)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "event_type": g["event_type"].to_numpy(),
                "quartile": tile,
            }
        )

    return ds.groupby("event_type").map_groups(tiles, batch_format="pandas")


def event_transitions(sf_dir: str, n_routes: int = 64):
    """Per-user event-type transition counts (the Markov-matrix primitive
    of behavioral analytics): for each user's (ts, event_id)-ordered
    stream, count (from_type → to_type) adjacencies. Distributed shape:
    route = user_id % n_routes (bounded map_groups cardinality — all of a
    user's events share a route), one vectorized shift-compare per group,
    per-group partial counts; the ≤ types² × n_routes partial rows merge
    on the driver (the bounded-partials gotcha). Counts are integers —
    exact vs the lag()-window oracle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "route", pa.array(uid % np.int64(n_routes), pa.int64())
        )

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        out = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        return out.groupby(["from_type", "to_type"], as_index=False).size()

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("route")
        .map_groups(trans, batch_format="pandas")
        .to_pandas()  # bounded: ≤ types² rows per route group
    )
    agg = partials.groupby(["from_type", "to_type"], as_index=False)["size"].sum()
    agg = agg.rename(columns={"size": "n"}).astype({"n": np.int64})
    agg = agg.sort_values(["from_type", "to_type"], kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(agg, preserve_index=False)


def running_totals(sf_dir: str, n_routes: int = 64):
    """Per-user running value totals in event-time order (the cumulative
    window-function primitive). Distributed shape: route = user_id %
    n_routes bucketed groups, ONE vectorized pandas cumsum per group
    (users never split across routes). Values are per-row e4 ints
    (round-4 exact-export rule) so every prefix sum is integer-exact vs
    the SUM() OVER window oracle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "route": pa.array(uid % np.int64(n_routes), pa.int64()),
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "value_e4": row_scaled_int(t["value"], 10_000),
            }
        )

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        c = g.groupby("user_id")["value_e4"].cumsum().to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": g["user_id"].to_numpy(np.int64),
                "cum_value_e4": c,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("route")
        .map_groups(cum, batch_format="pandas")
    )


def value_histogram(sf_dir: str, width: float = 25.0):
    """Fixed-width histogram of event value (the profiling primitive for
    any numeric column at scale): each batch collapses to one partial
    count-per-bin row set via np.bincount, so the shuffle carries
    O(bins × blocks) rows regardless of input size. Bin = floor(value /
    width) — the identical IEEE double division on both engines."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / width).astype(np.int64)
        nbin = int(b.max()) + 1 if len(b) else 0
        cnt = np.bincount(b, minlength=nbin)
        present = np.flatnonzero(cnt)
        return pa.table(
            {
                "bin": pa.array(present.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[present].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) counts: detail + per-lang subtotal +
    grand total. The (lang, source) key space is tiny, so the detail
    level is a within-batch combiner (≤ |langs|·|sources| rows per
    block) merged on the driver — no shuffle at all; the subtotal and
    total levels derive from the detail frame (the rollup-at-scale
    shape: every level is pre-aggregated before it moves)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "source"])

    def pair_counts(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_numpy(zero_copy_only=False),
                "source": t["source"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["lang", "source"], sort=False, as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(pair_counts, batch_format="pyarrow").to_pandas()
    detail = parts.groupby(["lang", "source"], as_index=False)["n"].sum()
    by_lang = detail.groupby("lang", as_index=False)["n"].sum()
    by_lang["source"] = None
    total = pd.DataFrame({"lang": [None], "source": [None], "n": [int(detail["n"].sum())]})
    out = pd.concat([detail, by_lang, total], ignore_index=True)[["lang", "source", "n"]]
    return pa.table(
        {
            "lang": pa.array(out["lang"].tolist(), pa.string()),
            "source": pa.array(out["source"].tolist(), pa.string()),
            "n": pa.array(out["n"].astype(np.int64).to_numpy(), pa.int64()),
        }
    )


def window_hopping(sf_dir: str, size_min: int = 60, hop_min: int = 30):
    """Hopping (sliding) 1h windows every 30min per user: each event
    belongs to size/hop windows — the explode is a vectorized column op
    per batch, then ONE groupby on (user, window_start). SQL mirror
    enumerates the same window starts with generate_series."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
    n_win = size_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = (ts // hop_us) * hop_us  # latest window start containing ts
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-row e4 ints (round-4 exact-export rule)
        val = row_scaled_int(t["value"], 10_000).to_numpy(zero_copy_only=False)
        starts = np.concatenate([base - j * hop_us for j in range(n_win)])
        uids = np.tile(uid, n_win)
        vals = np.tile(val, n_win)
        # within-batch partial combine (round-5, VERDICT r4 #3 — the
        # top_ngrams combiner pattern): the shuffle then moves one row
        # per (user, window) per BATCH instead of n_win rows per event
        pairs = np.stack([uids, starts], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, vals)  # int64 accumulate — exact-export rule
        return pa.table(
            {
                "user_id": pa.array(uniq[:, 0], pa.int64()),
                "window_start": pa.array(
                    uniq[:, 1].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "n": pa.array(cnt, pa.int64()),
                "value_e4": pa.array(sums, pa.int64()),
            }
        )

    # round-5: the two-Sum Ray sort-aggregate replaced with one
    # route-group exchange (the Q17/Q13 lesson): route by
    # splitmix64(user), a user's partials are complete within the group
    from ..strategy import splitmix64

    n_routes = auto_routes(ds)

    def add_route(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        route = (
            splitmix64(uid.view(np.uint64)) % np.uint64(n_routes)
        ).astype(np.int64)
        return t.append_column("route", pa.array(route, pa.int64()))

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "window_start"], sort=False, as_index=False).agg(
            n=("n", "sum"), sum_value_e4=("value_e4", "sum")
        )
        return g

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(group_fn, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["user_id", "window_start", "n", "sum_value_e4"]).set_column(
            1, "window_start", pc.cast(t["window_start"], pa.timestamp("us"))
        )

    return out.map_batches(finish, batch_format="pyarrow")


def percent_rank_events(sf_dir: str):
    """SQL percent_rank() window function (round-4 tail, PLAN_r5 #5):
    each event's percentile rank of `value` within its event_type,
    pr = (min_rank - 1) / (n - 1), exported as the repo-wide scaled int
    floor(pr * 1e6 + 0.5). Association matches the oracle exactly:
    DuckDB computes percent_rank as the double (rank-1)/(n-1) and the
    engine performs the identical double divide-then-scale (ranks and
    counts are integers — exactly representable — so the division is the
    only rounding step and it is correctly rounded in both engines).
    Distributed shape: groupby(event_type).map_groups with a vectorized
    pandas min-rank inside — group cardinality = event-type cardinality
    (bounded); a high-cardinality partition key would use the
    route-group pattern instead (see ntile_quartiles)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        r = g["value"].rank(method="min").to_numpy(np.float64)
        frac = (r - 1.0) / (n - 1.0) if n > 1 else np.zeros(n, dtype=np.float64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "event_type": g["event_type"].to_numpy(),
                "prank_e6": np.floor(frac * 1_000_000.0 + 0.5).astype(np.int64),
            }
        )

    return ds.groupby("event_type").map_groups(pr, batch_format="pandas")


def cume_dist_events(sf_dir: str):
    """SQL cume_dist() window function: fraction of the event_type's rows
    with value <= this row's value (max-rank / n), exported as the
    repo-wide floor(cd * 1e6 + 0.5) scaled int. Same exactness argument
    as percent_rank_events: ranks and counts are exactly-representable
    ints, the single double division is correctly rounded identically in
    numpy and DuckDB, so the e6 floor agrees. Distributed shape:
    groupby(event_type).map_groups, vectorized max-rank per group
    (bounded group cardinality — the route-group pattern covers the
    high-cardinality case)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def cd(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        r = g["value"].rank(method="max").to_numpy(np.float64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "event_type": g["event_type"].to_numpy(),
                "cume_e6": np.floor(r / n * 1_000_000.0 + 0.5).astype(np.int64),
            }
        )

    return ds.groupby("event_type").map_groups(cd, batch_format="pandas")


def lead_deltas(sf_dir: str, n_routes: int = 64):
    """Per-user delta to the NEXT event's value (the lead() window
    primitive): delta_e4 = next value_e4 - value_e4 over the
    (ts, event_id) total order, one row per event that has a successor.
    Values are per-row e4 ints (round-4 exact-export rule) so the
    subtraction is integer-exact vs the lead()-window oracle.
    Distributed shape: route = user_id % n_routes (users never split),
    one vectorized sorted shift-compare per group."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "route": pa.array(uid % np.int64(n_routes), pa.int64()),
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "value_e4": row_scaled_int(t["value"], 10_000),
            }
        )

    def delta(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        v = g["value_e4"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        return pd.DataFrame(
            {
                "event_id": eid[:-1][same],
                "user_id": uid[:-1][same],
                "delta_e4": v[1:][same] - v[:-1][same],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("route")
        .map_groups(delta, batch_format="pandas")
    )


def nth_value_events(sf_dir: str, n: int = 3, n_routes: int = 64):
    """nth_value() window primitive (round-5, the PLAN_r5 remaining
    window idea): per user, the event_id and value of the n-th event
    over the (ts, event_id) total order; users with fewer than n events
    are absent (row_number() = n semantics). Values are per-row e4 ints
    (exact-export rule). Distributed shape: route = user_id % n_routes
    (users never split across groups — the first_last_values pattern),
    one vectorized sort + offset-scan per group; only (route, user, ts,
    id, value_e4) tuples move through the shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "route": pa.array(uid % np.int64(n_routes), pa.int64()),
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "value_e4": row_scaled_int(t["value"], 10_000),
            }
        )

    def nth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        first = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        counts = np.r_[first[1:], len(uid)] - first
        pos = first[counts >= n] + (n - 1)
        return pd.DataFrame(
            {
                "user_id": uid[pos],
                "nth_event_id": g["event_id"].to_numpy(np.int64)[pos],
                "nth_value_e4": g["value_e4"].to_numpy(np.int64)[pos],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("route")
        .map_groups(nth, batch_format="pandas")
    )


def first_last_values(sf_dir: str, n_routes: int = 64):
    """first_value()/last_value() window primitives: per user, the value
    and event_id of the first and last event over the (ts, event_id)
    total order. Values are per-row e4 ints (round-4 exact-export rule)
    so the export is integer-exact vs the row_number()=1 oracle.
    Distributed shape: route = user_id % n_routes (users never split
    across groups — the lead_deltas pattern), one vectorized
    sort + boundary-scan per group; only (route, user, ts, id, value_e4)
    tuples move through the shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "route": pa.array(uid % np.int64(n_routes), pa.int64()),
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "value_e4": row_scaled_int(t["value"], 10_000),
            }
        )

    def fl(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        v = g["value_e4"].to_numpy(np.int64)
        first = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        last = np.r_[first[1:] - 1, len(uid) - 1]
        return pd.DataFrame(
            {
                "user_id": uid[first],
                "first_event_id": eid[first],
                "last_event_id": eid[last],
                "first_value_e4": v[first],
                "last_value_e4": v[last],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("route")
        .map_groups(fl, batch_format="pandas")
    )


def mad_outliers(sf_dir: str):
    """Robust per-type outlier profile: median, MAD (median absolute
    deviation) and the count of rows with |v - med| > 3·MAD, all over
    per-row e4 ints — median/MAD are quantile_disc picks
    (sorted[ceil(q·n) - 1]) and the 3·MAD threshold is integer
    arithmetic, so the export is integer-exact end to end (no variance
    square that would overflow int64). Distributed shape:
    groupby(event_type).map_groups with two vectorized sorts per group;
    event_type cardinality is bounded. At unbounded group sizes the
    exact median would move to the KLL path (`quantile_sketch`) — this
    op is the exact-tier sibling."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "v": row_scaled_int(t["value"], 10_000),
            }
        )

    def mad(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["v"].to_numpy(np.int64))
        n = len(v)
        med = int(v[int(np.ceil(0.5 * n)) - 1])
        ad = np.sort(np.abs(v - med))
        m = int(ad[int(np.ceil(0.5 * n)) - 1])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [n],
                "med_e4": [med],
                "mad_e4": [m],
                "n_outliers": [int((ad > 3 * m).sum())],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(mad, batch_format="pandas")
    )


def shipping_priority(sf_dir: str, k: int = 10, n_routes: int | None = None):
    """TPC-H Q3-shaped shipping-priority top-k (public query shape): the
    unshipped revenue of BUILDING-segment customers' pre-cutoff orders,
    top-k orders by revenue. Three-table pipeline with NO broadcast side
    (at 100 TB customer/orders/lineitem are all fact-sized here):

      customer(filtered segment, key only)  ⋈  orders(filtered date)
        via hash_shuffle_join on custkey (route-bounded, both stream)
      lineitem(filtered shipdate) → per-batch COMBINER: row-scaled-int
        revenue pre-summed by l_orderkey inside each block (≤1 row per
        (block, order) leaves the map stage)
        ⋈ the joined orders via hash_shuffle_join on orderkey
      → groupby(order) Sum of int64 partials (order-independent)
      → per-block partial top-k, driver merges ≤ k×blocks rows.

    Integer-exact export: revenue_e4 = sum of per-ROW
    floor(l_extendedprice*(1-l_discount)*1e4 + 0.5) (the repo-wide
    exact-export rule; association matches pricing_summary's oracle)."""
    cutoff = pa.scalar(np.datetime64("1998-01-01", "us"))

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )

    def cust_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], pa.scalar("BUILDING")))
        return t.select(["c_custkey"])

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], cutoff))
        # carry the date as int64 µs so it survives the neutral-fill
        # union inside hash_shuffle_join with an integer dtype
        od_us = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "od_us": pa.array(od_us, pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    if n_routes is None:
        n_routes = auto_routes(cust, orders, line)

    bld_orders = hash_shuffle_join(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        cust.map_batches(cust_filter, batch_format="pyarrow"),
        "o_custkey",
        "c_custkey",
        n_routes=n_routes,
    )

    def line_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby("l_orderkey", sort=False, as_index=False)["rev_e4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_e4", "od_us", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)

    # fold the per-order sum AND the partial top-k INTO the join's route
    # groups (post=): the join co-partitions by l_orderkey, so each
    # order's partials are complete within one group — no second
    # all-to-all, and only ≤ k rows per group ever leave the group
    def per_order_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_orderkey", "od_us", "o_orderpriority"], sort=False, as_index=False
        )["rev_e4"].sum().rename(columns={"rev_e4": "revenue_e4"})
        return topk(g)

    per_order = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        bld_orders.drop_columns(["o_custkey"]),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=per_order_topk,
    )

    # bounded: ≤ k rows per route group reach the driver
    out = topk(per_order.to_pandas()).reset_index(drop=True)
    return pa.table(
        {
            "l_orderkey": pa.array(out["l_orderkey"].to_numpy(np.int64), pa.int64()),
            "o_orderdate": pa.array(
                out["od_us"].to_numpy(np.int64).astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(
                out["o_orderpriority"].tolist(), pa.string()
            ),
            "revenue_e4": pa.array(out["revenue_e4"].to_numpy(np.int64), pa.int64()),
        }
    )


def local_supplier_volume(sf_dir: str, n_routes: int | None = None):
    """TPC-H Q5-shaped local-supplier volume (public query shape):
    revenue per (region, nation) from lineitems whose supplier sits in
    the ordering customer's own nation, over a 3-year order window.
    Six-table composition with the repo's two join regimes:

      dims (supplier→nationkey, nation⋈region→names) broadcast ONCE via
        ray.put as decoded dense-key arrays (star_join pattern — they
        are small everywhere, even at 100 TB);
      facts chain through TWO hash_shuffle_joins with no broadcast side:
        orders(date-filtered) ⋈ customer on custkey → c_nationkey,
        lineitem per-batch COMBINER (row-scaled-int revenue pre-summed
        by (orderkey, suppkey) inside each block) ⋈ that on orderkey;
      the local-supplier predicate (supplier nation == customer nation)
        is a vectorized dim gather + equality mask per batch — never a
        shuffle — and the final groupby is a bounded driver merge
        (≤ |nations| rows per block).

    Integer-exact export: revenue_e4 sums per-ROW
    floor(l_extendedprice*(1-l_discount)*1e4 + 0.5)."""
    import ray

    supp = pd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    nm = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    max_nk = int(nm["n_nationkey"].max())
    n_name_by_key = [""] * (max_nk + 1)
    r_name_by_key = [""] * (max_nk + 1)
    for nk, nn_, rn in zip(nm["n_nationkey"], nm["n_name"], nm["r_name"]):
        n_name_by_key[int(nk)] = nn_
        r_name_by_key[int(nk)] = rn
    supp_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1, np.int64)
    supp_nat[supp["s_suppkey"].to_numpy(np.int64)] = supp["s_nationkey"].to_numpy(
        np.int64
    )
    lk_ref = ray.put((supp_nat, n_name_by_key, r_name_by_key))

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1999-01-01", "us"))
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        t = t.filter(m)
        return t.select(["o_custkey", "o_orderkey"])

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )

    def cust_sel(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if n_routes is None:
        n_routes = auto_routes(cust, orders, line)

    cust_orders = hash_shuffle_join(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        cust.map_batches(cust_sel, batch_format="pyarrow"),
        "o_custkey",
        "c_custkey",
        n_routes=n_routes,
    )

    def line_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False)[
            "rev_e4"
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def local_partial(df: pd.DataFrame) -> pd.DataFrame:
        snk, n_names, r_names = ray.get(lk_ref)
        sk = df["l_suppkey"].to_numpy(np.int64)
        # bounds-mask BEFORE indexing (star_join lesson): dirty FK keys
        # behave as inner-join drops, not IndexError / wraparound
        sk_ok = (sk >= 0) & (sk < len(snk))
        s_nat = np.where(sk_ok, snk[np.where(sk_ok, sk, 0)], -1)
        keep = (s_nat >= 0) & (s_nat == df["c_nationkey"].to_numpy(np.int64))
        if not keep.any():
            return pd.DataFrame(
                {
                    "r_name": pd.Series([], dtype=object),
                    "n_name": pd.Series([], dtype=object),
                    "revenue_e4": pd.Series([], dtype=np.int64),
                }
            )
        nk = s_nat[keep]
        # NO n_items export: the combiner collapses lineitem rows within
        # each block, so row counts here are block-layout-dependent —
        # only the int64 revenue sums are layout-invariant
        cnt = np.bincount(nk, minlength=len(n_names))
        rev = np.bincount(
            nk, weights=df["rev_e4"].to_numpy(np.float64)[keep], minlength=len(n_names)
        )
        present = np.flatnonzero(cnt)
        return pd.DataFrame(
            {
                "r_name": [r_names[i] for i in present],
                "n_name": [n_names[i] for i in present],
                "revenue_e4": rev[present].astype(np.int64),
            }
        )

    # the local-supplier mask + per-nation partial ride the join's route
    # groups (post=, round 5): only ≤ |nations| rows leave each group —
    # the joined table never lands in the object store
    joined = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        cust_orders.drop_columns(["o_custkey"]),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=local_partial,
    )
    partials = joined.to_pandas()
    agg = partials.groupby(["r_name", "n_name"], as_index=False).agg(
        revenue_e4=("revenue_e4", "sum")
    )
    agg = agg.sort_values(["r_name", "n_name"], kind="mergesort").reset_index(drop=True)
    agg = agg.astype({"revenue_e4": np.int64})
    return pa.table(
        {
            "r_name": pa.array(agg["r_name"].tolist(), pa.string()),
            "n_name": pa.array(agg["n_name"].tolist(), pa.string()),
            "revenue_e4": pa.array(agg["revenue_e4"].to_numpy(np.int64), pa.int64()),
        }
    )


def revenue_forecast(sf_dir: str):
    """TPC-H Q6-shaped revenue forecast (public query shape): the scalar
    revenue delta of dropping small-quantity discounts in one shipdate
    year. The cheapest possible distributed shape — predicate + per-ROW
    scaled-int revenue inside each block, ONE partial row per block, a
    bounded driver sum. At 100 TB this is a pure column-pruned scan with
    no shuffle at all.

    Integer-exact export: revenue_e4 sums per-ROW
    floor(l_extendedprice*l_discount*1e4 + 0.5) (repo exact-export rule)."""
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        s = int(
            np.sum(row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False))
        ) if t.num_rows else 0
        return pa.table(
            {
                "revenue_e4": pa.array([s], pa.int64()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
            }
        )

    # bounded: one row per block reaches the driver
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "revenue_e4": pa.array([int(parts["revenue_e4"].sum())], pa.int64()),
            "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
        }
    )


def promo_revenue(sf_dir: str):
    """TPC-H Q14-shaped promo-revenue share (public query shape): what
    fraction of one shipdate month's revenue came from PROMO-typed parts.
    part is dim-small relative to lineitem at every scale, so it is
    broadcast ONCE via ray.put as a dense is-promo bitmap indexed by
    p_partkey (the star_join pattern); lineitem streams with a per-block
    partial (promo_e4, total_e4) pair — no shuffle, bounded driver merge.

    Integer-exact export: the two sums follow the per-ROW scaled-int rule;
    the share is exported as promo_share_e6 = (promo*1e6) // total in
    ARBITRARY-precision integers (Python int / DuckDB HUGEINT — identical
    floor division, no float in sight)."""
    import ray

    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    promo = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    promo[part["p_partkey"].to_numpy(np.int64)] = (
        part["p_type"].str.startswith("PROMO").to_numpy()
    )
    promo_ref = ray.put(promo)

    lo = pa.scalar(np.datetime64("1997-09-01", "us"))
    hi = pa.scalar(np.datetime64("1997-10-01", "us"))
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        pm = ray.get(promo_ref)
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
        )
        t = t.filter(m)
        if not t.num_rows:
            return pa.table(
                {
                    "promo_revenue_e4": pa.array([0], pa.int64()),
                    "total_revenue_e4": pa.array([0], pa.int64()),
                }
            )
        rev = row_scaled_int(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            10_000,
        ).to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # bounds-mask before indexing (star_join lesson): unknown part
        # keys count as non-promo, never IndexError/wraparound
        ok = (pk >= 0) & (pk < len(pm))
        is_promo = np.where(ok, pm[np.where(ok, pk, 0)], False)
        return pa.table(
            {
                "promo_revenue_e4": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_revenue_e4": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    p = int(parts["promo_revenue_e4"].sum())
    tot = int(parts["total_revenue_e4"].sum())
    share = (p * 1_000_000) // tot if tot else 0  # exact int floor division
    return pa.table(
        {
            "promo_revenue_e4": pa.array([p], pa.int64()),
            "total_revenue_e4": pa.array([tot], pa.int64()),
            "promo_share_e6": pa.array([share], pa.int64()),
        }
    )


def returned_item_revenue(sf_dir: str, k: int = 20, n_routes: int | None = None):
    """TPC-H Q10-shaped returned-item report (public query shape): the
    top-k customers by revenue lost to returned ('R') lineitems against
    one order quarter. customer and orders are both fact-sized at 100 TB,
    so the chain is two hash_shuffle_joins with NO broadcast side:

      lineitem(returnflag='R') per-block COMBINER by l_orderkey
        ⋈ orders(quarter window) on orderkey → o_custkey
      → per-block partial re-sum by custkey → groupby(custkey) Sum
      → per-block partial top-k, driver merges ≤ k×blocks rows
      → names for the FINAL k customers only, via a distributed
        is_in-filtered customer scan (k rows reach the driver) and the
        nation dim decoded driver-side (25 rows everywhere).

    Integer-exact export: revenue_e4 per-ROW scaled; acctbal_e2 =
    floor(c_acctbal*100 + 0.5)."""
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    if n_routes is None:
        n_routes = auto_routes(orders, line)

    def line_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("l_orderkey", sort=False, as_index=False)["rev_e4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False, as_index=False)["rev_e4"].sum()
        return g.rename(columns={"rev_e4": "revenue_e4"})

    # the per-cust partial rides the join's route groups (post=, round
    # 5): the custkey re-key still needs its own exchange (different key
    # than the join), but it now shuffles per-group partials, never the
    # full joined table
    joined = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=cust_partial,
    )

    # round-5: the custkey re-key is a route-group exchange (the
    # Q17/Q13 lesson) — a custkey's partials are complete within its
    # group, so the sum AND the local top-k run inside map_groups;
    # ≤ k rows per group reach the driver
    from ..strategy import splitmix64

    def add_route(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        route = (
            splitmix64(ck.view(np.uint64)) % np.uint64(n_routes)
        ).astype(np.int64)
        return t.append_column("route", pa.array(route, pa.int64()))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_e4", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    def cust_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False, as_index=False)["revenue_e4"].sum()
        return topk(g)

    winners = topk(
        joined.map_batches(add_route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(cust_group, batch_format="pandas")
        .to_pandas()
    ).reset_index(drop=True)

    want = set(winners["o_custkey"].astype(np.int64).tolist())
    cust = rd.read_parquet(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )

    def pick(t: pa.Table) -> pa.Table:
        keys = pa.array(sorted(want), pa.int64())
        return t.filter(pc.is_in(pc.cast(t["c_custkey"], pa.int64()), keys))

    # bounded: exactly k customer rows reach the driver
    names = cust.map_batches(pick, batch_format="pyarrow").to_pandas()
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    names = names.merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "c_name", "c_acctbal", "n_name"]]
    out = winners.merge(names, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["revenue_e4", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    acct = np.floor(out["c_acctbal"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64), pa.int64()),
            "c_name": pa.array(out["c_name"].tolist(), pa.string()),
            "n_name": pa.array(out["n_name"].tolist(), pa.string()),
            "acctbal_e2": pa.array(acct, pa.int64()),
            "revenue_e4": pa.array(out["revenue_e4"].to_numpy(np.int64), pa.int64()),
        }
    )


def large_volume_orders(sf_dir: str, qty_threshold: float = 200.0, k: int = 100,
                        n_routes: int | None = None):
    """TPC-H Q18-shaped large-volume-customer report (public query shape):
    orders whose total lineitem quantity exceeds a threshold, with the
    ordering customer's name, top-k by order totalprice. Shape:

      lineitem per-block COMBINER by l_orderkey (qty_e2 partial sums)
      ⋈ orders on orderkey via hash_shuffle_join (orders streams); the
        per-order Sum + HAVING fold into the join's route groups
        (post=) — one all-to-all, survivors stay a Dataset
      → per-block partial top-k by (totalprice desc, orderkey), driver
        merges ≤ k×blocks rows → names for the k winners via an
        is_in-filtered customer scan (k rows to the driver).

    Integer-exact export: total_qty_e2 / totalprice_e2 per-ROW scaled."""
    line = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    )

    def line_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "qty_e2": row_scaled_int(t["l_quantity"], 100).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby("l_orderkey", sort=False, as_index=False)["qty_e2"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    thr = int(qty_threshold * 100)
    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    if n_routes is None:
        n_routes = auto_routes(line, orders)

    def ord_prep(t: pa.Table) -> pa.Table:
        od_us = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "od_us": pa.array(od_us, pa.int64()),
                "totalprice_e2": row_scaled_int(t["o_totalprice"], 100),
            }
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["totalprice_e2", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    # the per-order Sum + HAVING + partial top-k all ride the join's
    # route groups (round 5): block-level qty partials join orders
    # directly; post= sums per order inside the group (complete there),
    # applies the threshold, and keeps only its local top-k — one
    # all-to-all, ≤ k rows ever leave each group
    def having_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_orderkey", "o_custkey", "od_us", "totalprice_e2"],
            sort=False,
            as_index=False,
        )["qty_e2"].sum().rename(columns={"qty_e2": "total_qty_e2"})
        return topk(g[g["total_qty_e2"] > thr])

    joined = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=having_topk,
    )

    # bounded: ≤ k rows per route group reach the driver
    winners = topk(joined.to_pandas()).reset_index(drop=True)

    want = set(winners["o_custkey"].astype(np.int64).tolist())
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def pick(t: pa.Table) -> pa.Table:
        keys = pa.array(sorted(want), pa.int64())
        return t.filter(pc.is_in(pc.cast(t["c_custkey"], pa.int64()), keys))

    names = cust.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = winners.merge(names, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["totalprice_e2", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    return pa.table(
        {
            "c_name": pa.array(out["c_name"].tolist(), pa.string()),
            "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64), pa.int64()),
            "o_orderkey": pa.array(out["l_orderkey"].to_numpy(np.int64), pa.int64()),
            "o_orderdate": pa.array(
                out["od_us"].to_numpy(np.int64).astype("datetime64[us]")
            ),
            "totalprice_e2": pa.array(
                out["totalprice_e2"].to_numpy(np.int64), pa.int64()
            ),
            "total_qty_e2": pa.array(
                out["total_qty_e2"].to_numpy(np.int64), pa.int64()
            ),
        }
    )


def late_shipment_priority(sf_dir: str, grace_days: int = 90,
                           n_routes: int | None = None):
    """TPC-H Q4-shaped order-priority check (public query shape, adapted
    to the available columns): per order priority, how many orders in one
    quarter have at least one lineitem shipped more than `grace_days`
    after the order date (EXISTS semantics). The EXISTS collapses to a
    per-order MAX:

      lineitem per-block COMBINER: max(l_shipdate) per l_orderkey
      ⋈ orders(quarter window) on orderkey via hash_shuffle_join, the
        per-order Max folded into the join's route groups (post=) — one
        int64 per (block, order) rides the ONLY exchange
      → vectorized late mask (max_ship_us > od_us + grace) per batch,
        per-block partial count by priority → bounded driver merge
        (≤ |priorities| rows per block)."""
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"))
    grace_us = np.int64(grace_days) * 86_400_000_000

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    )

    def line_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship_us": t["l_shipdate"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64),
            }
        )
        g = df.groupby("l_orderkey", sort=False, as_index=False)["ship_us"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    if n_routes is None:
        n_routes = auto_routes(line, orders)

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        t = t.filter(m)
        od_us = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "od_us": pa.array(od_us, pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    # the per-order Max AND the late-count partial both ride the join's
    # route groups (round 5): block-level ship_us partials join orders
    # directly; post= takes the per-order max inside the group (all of an
    # order's partials land there), applies the late mask, and collapses
    # to per-priority counts — one all-to-all total, and only
    # ≤ |priorities| rows ever leave each group
    def late_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_orderkey", "od_us", "o_orderpriority"], sort=False, as_index=False
        )["ship_us"].max()
        late = g["ship_us"].to_numpy(np.int64) > (
            g["od_us"].to_numpy(np.int64) + grace_us
        )
        sub = pd.DataFrame({"o_orderpriority": g["o_orderpriority"], "late": late})
        out = sub.groupby("o_orderpriority", sort=False, as_index=False).agg(
            late_count=("late", "sum")
        )
        out = out[out["late_count"] > 0]
        out["late_count"] = out["late_count"].astype(np.int64)
        return out

    joined = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=late_partial,
    )

    # bounded: ≤ |priorities| rows per route group reach the driver
    parts = joined.to_pandas()
    agg = parts.groupby("o_orderpriority", as_index=False)["late_count"].sum()
    agg = agg.sort_values("o_orderpriority", kind="mergesort").reset_index(drop=True)
    return pa.table(
        {
            "o_orderpriority": pa.array(agg["o_orderpriority"].tolist(), pa.string()),
            "late_count": pa.array(
                agg["late_count"].astype(np.int64).to_numpy(), pa.int64()
            ),
        }
    )


def nation_trade_volume(sf_dir: str, n_routes: int | None = None):
    """TPC-H Q7-shaped cross-nation trade matrix (public query shape,
    adapted to the available columns): revenue per (supplier nation,
    customer nation, order year) over a two-year order window, for
    nation pairs where the supplier and customer nations DIFFER — the
    complement of local_supplier_volume's same-nation predicate, same
    join plan:

      supplier→nationkey broadcast ONCE via ray.put as a decoded
        dense-key array (small everywhere, even at 100 TB);
      orders(date window, year precomputed) ⋈ customer on custkey via
        hash_shuffle_join;
      lineitem per-block COMBINER (row-scaled-int revenue pre-summed by
        (orderkey, suppkey)) ⋈ that on orderkey, the cross-nation mask +
        per-(s_nat, c_nat, year) partial folded into the join's route
        groups (post=) — ≤ |nations|² × 2 rows leave each group;
      bounded driver merge.

    Integer-exact export: revenue_e4 sums per-ROW
    floor(l_extendedprice*(1-l_discount)*1e4 + 0.5) as int64 end to end
    (pandas int-key groupby inside the partial, never float weights)."""
    import ray

    supp = pd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    max_nk = int(nat["n_nationkey"].max())
    n_name_by_key = [""] * (max_nk + 1)
    for nk, nn_ in zip(nat["n_nationkey"], nat["n_name"]):
        n_name_by_key[int(nk)] = nn_
    supp_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1, np.int64)
    supp_nat[supp["s_suppkey"].to_numpy(np.int64)] = supp["s_nationkey"].to_numpy(
        np.int64
    )
    lk_ref = ray.put((supp_nat, n_name_by_key))

    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    year0 = 1995

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        t = t.filter(m)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )

    def cust_sel(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if n_routes is None:
        n_routes = auto_routes(cust, orders, line)

    cust_orders = hash_shuffle_join(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        cust.map_batches(cust_sel, batch_format="pyarrow"),
        "o_custkey",
        "c_custkey",
        n_routes=n_routes,
    )

    def line_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False)[
            "rev_e4"
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    n_codes_y = 2  # two order years in the window

    def trade_partial(df: pd.DataFrame) -> pd.DataFrame:
        snk, n_names = ray.get(lk_ref)
        nn = len(n_names)
        sk = df["l_suppkey"].to_numpy(np.int64)
        # bounds-mask BEFORE indexing (star_join lesson): dirty FK keys
        # behave as inner-join drops, not IndexError / wraparound
        sk_ok = (sk >= 0) & (sk < len(snk))
        s_nat = np.where(sk_ok, snk[np.where(sk_ok, sk, 0)], -1)
        c_nat = df["c_nationkey"].to_numpy(np.int64)
        keep = (s_nat >= 0) & (s_nat != c_nat) & (c_nat >= 0) & (c_nat < nn)
        if not keep.any():
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series([], dtype=object),
                    "cust_nation": pd.Series([], dtype=object),
                    "l_year": pd.Series([], dtype=np.int64),
                    "revenue_e4": pd.Series([], dtype=np.int64),
                }
            )
        yr = df["o_year"].to_numpy(np.int64)[keep] - year0
        code = (s_nat[keep] * nn + c_nat[keep]) * n_codes_y + yr
        g = (
            pd.DataFrame({"code": code, "rev": df["rev_e4"].to_numpy(np.int64)[keep]})
            .groupby("code", sort=False, as_index=False)["rev"]
            .sum()
        )
        cd = g["code"].to_numpy(np.int64)
        pair = cd // n_codes_y
        return pd.DataFrame(
            {
                "supp_nation": [n_names[i] for i in pair // nn],
                "cust_nation": [n_names[i] for i in pair % nn],
                "l_year": (cd % n_codes_y) + year0,
                "revenue_e4": g["rev"].to_numpy(np.int64),
            }
        )

    joined = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        cust_orders.drop_columns(["o_custkey"]),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=trade_partial,
    )
    # bounded: ≤ |nations|² × 2 rows per route group reach the driver
    parts = joined.to_pandas()
    agg = parts.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)[
        "revenue_e4"
    ].sum()
    agg = agg.sort_values(
        ["supp_nation", "cust_nation", "l_year"], kind="mergesort"
    ).reset_index(drop=True)
    return pa.table(
        {
            "supp_nation": pa.array(agg["supp_nation"].tolist(), pa.string()),
            "cust_nation": pa.array(agg["cust_nation"].tolist(), pa.string()),
            "l_year": pa.array(agg["l_year"].to_numpy(np.int64), pa.int64()),
            "revenue_e4": pa.array(agg["revenue_e4"].to_numpy(np.int64), pa.int64()),
        }
    )


def nation_market_share(
    sf_dir: str, region: str = "ASIA", n_routes: int | None = None
):
    """TPC-H Q8-shaped market share (public query shape, adapted to the
    available columns): among orders placed by customers of one REGION
    over a two-year window, each supplier nation's share of the region's
    revenue per order year. Same join plan as nation_trade_volume, with
    the region predicate pushed into the customer build side (customers
    outside the region never enter the exchange):

      customer ⋈ nation⋈region collapses to a vectorized dense-key
        region mask applied in the customer map (build side shrinks at
        the scan);
      orders(window, year) ⋈ customer, then the lineitem combiner ⋈
        on orderkey with the per-(supplier nation, year) revenue partial
        folded into the route groups (post=);
      driver: share_e6 = (nation_rev_e4 * 1e6) // year_total_e4 — exact
        Python-int floor division (arbitrary precision, the
        promo_revenue idiom; SQL mirror: HUGEINT `//`)."""
    import ray

    supp = pd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    max_nk = int(nat["n_nationkey"].max())
    n_name_by_key = [""] * (max_nk + 1)
    in_region = np.zeros(max_nk + 1, dtype=bool)
    for nk, nn_, rk in zip(nat["n_nationkey"], nat["n_name"], nat["n_regionkey"]):
        n_name_by_key[int(nk)] = nn_
        in_region[int(nk)] = int(rk) == rkey
    supp_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1, np.int64)
    supp_nat[supp["s_suppkey"].to_numpy(np.int64)] = supp["s_nationkey"].to_numpy(
        np.int64
    )
    lk_ref = ray.put((supp_nat, n_name_by_key))
    inreg_ref = ray.put(in_region)

    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    year0 = 1995
    n_codes_y = 2

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
        )
        t = t.filter(m)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )

    def cust_region(t: pa.Table) -> pa.Table:
        inreg = ray.get(inreg_ref)
        ck = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (ck >= 0) & (ck < len(inreg))
        keep = np.zeros(len(ck), dtype=bool)
        keep[ok] = inreg[ck[ok]]
        return pa.table({"c_custkey": pc.filter(t["c_custkey"], pa.array(keep))})

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if n_routes is None:
        n_routes = auto_routes(cust, orders, line)

    cust_orders = hash_shuffle_join(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        cust.map_batches(cust_region, batch_format="pyarrow"),
        "o_custkey",
        "c_custkey",
        n_routes=n_routes,
    )

    def line_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False, as_index=False)[
            "rev_e4"
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def share_partial(df: pd.DataFrame) -> pd.DataFrame:
        snk, n_names = ray.get(lk_ref)
        sk = df["l_suppkey"].to_numpy(np.int64)
        sk_ok = (sk >= 0) & (sk < len(snk))
        s_nat = np.where(sk_ok, snk[np.where(sk_ok, sk, 0)], -1)
        keep = s_nat >= 0
        if not keep.any():
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series([], dtype=object),
                    "l_year": pd.Series([], dtype=np.int64),
                    "revenue_e4": pd.Series([], dtype=np.int64),
                }
            )
        yr = df["o_year"].to_numpy(np.int64)[keep] - year0
        code = s_nat[keep] * n_codes_y + yr
        g = (
            pd.DataFrame({"code": code, "rev": df["rev_e4"].to_numpy(np.int64)[keep]})
            .groupby("code", sort=False, as_index=False)["rev"]
            .sum()
        )
        cd = g["code"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "supp_nation": [n_names[i] for i in cd // n_codes_y],
                "l_year": (cd % n_codes_y) + year0,
                "revenue_e4": g["rev"].to_numpy(np.int64),
            }
        )

    joined = hash_shuffle_join(
        line.map_batches(line_partial, batch_format="pyarrow"),
        cust_orders.drop_columns(["o_custkey"]),
        "l_orderkey",
        "o_orderkey",
        n_routes=n_routes,
        post=share_partial,
    )
    # bounded: ≤ |nations| × 2 rows per route group reach the driver
    parts = joined.to_pandas()
    agg = parts.groupby(["supp_nation", "l_year"], as_index=False)["revenue_e4"].sum()
    totals = agg.groupby("l_year")["revenue_e4"].sum().to_dict()
    share = [
        (int(r) * 1_000_000) // int(totals[y]) if totals[y] else 0
        for r, y in zip(agg["revenue_e4"], agg["l_year"])
    ]
    agg["share_e6"] = np.array(share, dtype=np.int64)
    agg = agg.sort_values(["supp_nation", "l_year"], kind="mergesort").reset_index(
        drop=True
    )
    return pa.table(
        {
            "supp_nation": pa.array(agg["supp_nation"].tolist(), pa.string()),
            "l_year": pa.array(agg["l_year"].to_numpy(np.int64), pa.int64()),
            "revenue_e4": pa.array(agg["revenue_e4"].to_numpy(np.int64), pa.int64()),
            "share_e6": pa.array(agg["share_e6"].to_numpy(np.int64), pa.int64()),
        }
    )


def customer_order_distribution(sf_dir: str):
    """TPC-H Q13-shaped customer order-count distribution (public query
    shape): how many customers placed exactly n orders, INCLUDING the
    zero bucket. One route-group exchange, no Ray aggregate:

      orders per-block COMBINER (value_counts by o_custkey) tagged
        route = splitmix64(custkey) % n_routes;
      groupby(route).map_groups: a custkey's partials are COMPLETE
        within its route group, so the per-customer total and the
        counts-of-counts partial both run inside the group
        (≤ distinct-count values rows leave each group);
      bounded driver merge; the zero bucket is total customers (parquet
        metadata count — no scan) minus customers with ≥ 1 order
        (FK-clean assumption, repo-wide for TPC-H data).

    Pure integer counts — exact at any scale."""
    from ..strategy import splitmix64

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
    n_routes = auto_routes(orders)

    def count_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["o_custkey"].combine_chunks())
        ck = vc.field("values").cast(pa.int64()).to_numpy(zero_copy_only=False)
        route = (
            splitmix64(ck.view(np.uint64)) % np.uint64(n_routes)
        ).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "n": vc.field("counts"),
                "route": pa.array(route, pa.int64()),
            }
        )

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("ck", sort=False)["n"].sum()
        hist = per_cust.value_counts()
        return pd.DataFrame(
            {
                "c_count": hist.index.to_numpy(np.int64),
                "custdist": hist.to_numpy(np.int64),
            }
        )

    parts = (
        orders.map_batches(count_partial, batch_format="pyarrow")
        .groupby("route")
        .map_groups(group_fn, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("c_count", as_index=False)["custdist"].sum()
    total_cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"]).count()
    zero = int(total_cust) - int(agg["custdist"].sum())
    if zero > 0:
        agg = pd.concat(
            [agg, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    agg = agg.sort_values("c_count", kind="mergesort").reset_index(drop=True)
    return pa.table(
        {
            "c_count": pa.array(agg["c_count"].to_numpy(np.int64), pa.int64()),
            "custdist": pa.array(agg["custdist"].to_numpy(np.int64), pa.int64()),
        }
    )


def top_supplier_revenue(sf_dir: str):
    """TPC-H Q15-shaped top supplier (public query shape): the
    supplier(s) with the maximum revenue over one quarter — ties kept,
    like the reference query's nested max. Shape:

      lineitem(quarter window) per-batch COMBINER (row-scaled-int
        revenue pre-summed by l_suppkey inside each block) → ONE groupby
        sum on suppkey (ints only on the wire);
      the aggregated table is ≤ |suppliers| rows (a dim cardinality —
        small everywhere, even at 100 TB), so max + tie winners are one
        bounded driver merge; supplier names attach via a driver lookup
        on the ≤ |winners| rows.

    Integer-exact export: revenue_e4 sums per-ROW
    floor(l_extendedprice*(1-l_discount)*1e4 + 0.5)."""
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def line_partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
        )
        t = t.filter(m)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        df = pd.DataFrame(
            {
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "rev_e4": row_scaled_int(rev, 10_000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("sk", sort=False, as_index=False)["rev_e4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = (
        line.map_batches(line_partial, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("rev_e4", alias_name="rev_e4"))
    )

    # bounded driver merge: the aggregated table is ≤ |suppliers| rows
    df = per_supp.to_pandas()
    best = int(df["rev_e4"].max())
    winners = (
        df[df["rev_e4"] == best]
        .sort_values("sk", kind="mergesort")
        .reset_index(drop=True)
    )
    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    name_by_key = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    return pa.table(
        {
            "s_suppkey": pa.array(winners["sk"].to_numpy(np.int64), pa.int64()),
            "s_name": pa.array(
                [name_by_key.get(int(k), "") for k in winners["sk"]], pa.string()
            ),
            "total_revenue_e4": pa.array(
                winners["rev_e4"].to_numpy(np.int64), pa.int64()
            ),
        }
    )


def small_quantity_revenue(sf_dir: str, n_routes: int | None = None):
    """TPC-H Q17-shaped small-quantity-order revenue (public query
    shape): per part brand, the revenue from lineitems whose quantity is
    below 20% of their part's average quantity — the
    correlated-subquery-as-self-join pattern collapsed to ONE exchange:

      rows pre-combine per block by (partkey, q_e2) — the predicate
        depends only on that pair, so a combined group is kept or
        dropped wholesale and n_items stays layout-invariant — then
        route = splitmix64(partkey) % n_routes;
      groupby(route).map_groups: every partkey's rows are COMPLETE
        within its route group (co-partitioning), so the per-part stats
        (sum q_e2, count — recovered exactly from the combined rows as
        Σ q_e2·n and Σ n), the predicate, and the per-brand partial all
        run inside the ONE group — no separate stats aggregate, no
        second all-to-all (the hash_shuffle_join(post=) lesson, applied
        to a self-join: both "sides" are the same rows);
      brand attaches via a broadcast dense-key array; bounded driver
        merge (≤ |brands| rows per group). One route group materializes
        ~1/n_routes of the combined lineitem bytes — the documented
        256–512 MB worker-heap envelope.

    Integer-exact predicate: l_quantity < 0.2·avg(l_quantity) ⟺
    5·q_e2·cnt < sum_q_e2 — pure int64 inequality, no float average
    anywhere (the SQL mirror uses the same rearrangement)."""
    import ray

    from ..strategy import splitmix64

    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    brand_by_key = np.full(int(part["p_partkey"].max()) + 1, "", dtype=object)
    brand_by_key[part["p_partkey"].to_numpy(np.int64)] = part["p_brand"].to_numpy(
        object
    )
    bk_ref = ray.put(brand_by_key)

    line = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    if n_routes is None:
        n_routes = auto_routes(line)

    def combine_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "q_e2": row_scaled_int(t["l_quantity"], 100).to_numpy(
                    zero_copy_only=False
                ),
                "rev_e4": row_scaled_int(t["l_extendedprice"], 10_000).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby(["l_partkey", "q_e2"], sort=False, as_index=False).agg(
            rev_e4=("rev_e4", "sum"), n=("rev_e4", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        g["route"] = (
            splitmix64(g["l_partkey"].to_numpy(np.int64).view(np.uint64))
            % np.uint64(n_routes)
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        bk = ray.get(bk_ref)
        pk = df["l_partkey"].to_numpy(np.int64)
        q = df["q_e2"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        gb = pd.Series(q * n).groupby(pk)
        sq = gb.transform("sum").to_numpy(np.int64)
        cnt = pd.Series(n).groupby(pk).transform("sum").to_numpy(np.int64)
        keep = 5 * q * cnt < sq
        if not keep.any():
            return pd.DataFrame(
                {
                    "p_brand": pd.Series([], dtype=object),
                    "revenue_e4": pd.Series([], dtype=np.int64),
                    "n_items": pd.Series([], dtype=np.int64),
                }
            )
        pkk = pk[keep]
        # bounds-mask BEFORE indexing (star_join lesson)
        pk_ok = (pkk >= 0) & (pkk < len(bk))
        g = (
            pd.DataFrame(
                {
                    "p_brand": np.where(pk_ok, bk[np.where(pk_ok, pkk, 0)], ""),
                    "rev": df["rev_e4"].to_numpy(np.int64)[keep],
                    "n": n[keep],
                }
            )
            .loc[lambda d: d["p_brand"] != ""]
            .groupby("p_brand", sort=False, as_index=False)
            .agg(revenue_e4=("rev", "sum"), n_items=("n", "sum"))
        )
        return g

    grouped = (
        line.map_batches(combine_rows, batch_format="pyarrow")
        .groupby("route")
        .map_groups(group_fn, batch_format="pandas")
    )
    # bounded: ≤ |brands| rows per route group reach the driver
    parts_df = grouped.to_pandas()
    agg = parts_df.groupby("p_brand", as_index=False).agg(
        revenue_e4=("revenue_e4", "sum"), n_items=("n_items", "sum")
    )
    agg = agg.sort_values("p_brand", kind="mergesort").reset_index(drop=True)
    return pa.table(
        {
            "p_brand": pa.array(agg["p_brand"].tolist(), pa.string()),
            "revenue_e4": pa.array(agg["revenue_e4"].to_numpy(np.int64), pa.int64()),
            "n_items": pa.array(agg["n_items"].to_numpy(np.int64), pa.int64()),
        }
    )
