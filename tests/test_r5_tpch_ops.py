"""Round-5 TPC-H-shaped compositions and event-time profiles — structural
properties beyond the SQL parity that test_queries_oracle.py already
parametrizes over every oracle (route-count invariance, threshold
monotonicity, profile completeness)."""

import numpy as np
import pandas as pd
import pytest

from frontera_ray.ops import relational, temporal

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    return res.sort_values(list(res.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_tpch_ops_route_invariant():
    """n_routes is a pure partitioning knob — results identical at any
    count (5 forces multi-key route groups)."""
    assert _df(relational.returned_item_revenue(SF, n_routes=5)).equals(
        _df(relational.returned_item_revenue(SF))
    )
    assert _df(relational.late_shipment_priority(SF, n_routes=5)).equals(
        _df(relational.late_shipment_priority(SF))
    )
    # the post= folds (per-group top-k / HAVING) must stay invariant to
    # how keys distribute over route groups
    assert _df(relational.shipping_priority(SF, n_routes=5)).equals(
        _df(relational.shipping_priority(SF))
    )
    assert _df(relational.large_volume_orders(SF, n_routes=5)).equals(
        _df(relational.large_volume_orders(SF))
    )


@pytest.mark.usefixtures("ray_session")
def test_large_volume_threshold_monotone():
    """Raising the HAVING threshold can only shrink the winner set, and
    every winner's quantity exceeds its threshold."""
    lo = _df(relational.large_volume_orders(SF, qty_threshold=150.0, k=1000))
    hi = _df(relational.large_volume_orders(SF, qty_threshold=250.0, k=1000))
    assert len(hi) < len(lo)
    assert (lo["total_qty_e2"] > 15000).all()
    assert (hi["total_qty_e2"] > 25000).all()
    assert set(hi["o_orderkey"]) <= set(lo["o_orderkey"])


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_bounds():
    out = relational.promo_revenue(SF).to_pandas()
    p, t, s = (
        int(out["promo_revenue_e4"][0]),
        int(out["total_revenue_e4"][0]),
        int(out["promo_share_e6"][0]),
    )
    assert 0 < p < t
    assert s == (p * 1_000_000) // t
    assert 0 < s < 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_event_profiles_complete_and_consistent():
    """Both profiles partition the whole events table: their counts sum to
    the table's row count, weekday value mass sums to the scaled total."""
    events = pd.read_parquet(f"{SF}/events.parquet")
    wk = temporal.weekday_activity(SF).to_pandas()
    hr = temporal.hourly_load(SF).to_pandas()
    assert int(wk["n"].sum()) == len(events)
    assert int(hr["n"].sum()) == len(events)
    assert wk["dow"].between(0, 6).all()
    assert hr["hour"].between(0, 23).all()
    exact_total = int(
        np.floor(events["value"].to_numpy(np.float64) * 10_000 + 0.5).sum()
    )
    assert int(wk["value_e4"].sum()) == exact_total


@pytest.mark.usefixtures("ray_session")
def test_grace_days_monotone():
    """A longer grace period can only reduce late counts."""
    strict = _df(relational.late_shipment_priority(SF, grace_days=30))
    lax = _df(relational.late_shipment_priority(SF, grace_days=365))
    s = strict.set_index("o_orderpriority")["late_count"]
    l = lax.set_index("o_orderpriority")["late_count"]
    joined = pd.concat([s, l], axis=1, keys=["s", "l"]).fillna(0)
    assert (joined["l"] <= joined["s"]).all()
    assert joined["s"].sum() > joined["l"].sum()


@pytest.mark.usefixtures("ray_session")
def test_nation_trade_volume_structure():
    """Q7 shape: no same-nation pairs, only in-window years, route-count
    invariant."""
    out = _df(relational.nation_trade_volume(SF))
    assert len(out) > 0
    assert (out["supp_nation"] != out["cust_nation"]).all()
    assert set(out["l_year"]) <= {1995, 1996}
    assert (out["revenue_e4"] > 0).all()
    assert _df(relational.nation_trade_volume(SF, n_routes=5)).equals(out)


@pytest.mark.usefixtures("ray_session")
def test_nation_market_share_sums_to_one():
    """Q8 shape: per-year floor-division shares sum to 1e6 minus at most
    one floor unit per nation; region filter keeps only region customers."""
    out = _df(relational.nation_market_share(SF))
    assert len(out) > 0
    for y, g in out.groupby("l_year"):
        s = int(g["share_e6"].sum())
        assert 1_000_000 - len(g) < s <= 1_000_000
    assert _df(relational.nation_market_share(SF, n_routes=5)).equals(out)


@pytest.mark.usefixtures("ray_session")
def test_customer_order_distribution_conserves_totals():
    """Q13 shape: the histogram partitions customers exactly, and its
    weighted sum recovers the total order count."""
    out = _df(relational.customer_order_distribution(SF))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    assert int(out["custdist"].sum()) == len(cust)
    assert int((out["c_count"] * out["custdist"]).sum()) == len(orders)
    ref = orders.groupby("o_custkey").size()
    zero = len(cust) - ref.index.nunique()
    got_zero = out.loc[out["c_count"] == 0, "custdist"]
    assert (int(got_zero.iloc[0]) if len(got_zero) else 0) == zero


@pytest.mark.usefixtures("ray_session")
def test_top_supplier_revenue_matches_reference():
    """Q15 shape: every returned row carries the same (maximal) revenue,
    matching a pandas per-row-floored reference."""
    out = _df(relational.top_supplier_revenue(SF))
    assert len(out) >= 1
    assert out["total_revenue_e4"].nunique() == 1
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    li = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1996-04-01")]
    rev = np.floor(
        li["l_extendedprice"].to_numpy(np.float64)
        * (1.0 - li["l_discount"].to_numpy(np.float64))
        * 10_000
        + 0.5
    ).astype(np.int64)
    ref = pd.DataFrame({"sk": li["l_suppkey"].to_numpy(np.int64), "rev": rev})
    ref = ref.groupby("sk")["rev"].sum()
    assert int(out["total_revenue_e4"].iloc[0]) == int(ref.max())
    assert set(out["s_suppkey"]) == set(ref[ref == ref.max()].index)


@pytest.mark.usefixtures("ray_session")
def test_small_quantity_revenue_matches_reference():
    """Q17 shape: integer-rearranged 0.2·avg predicate equals the float
    reference on FK-clean data; route-count invariant."""
    out = _df(relational.small_quantity_revenue(SF))
    assert len(out) > 0
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    q_e2 = np.floor(li["l_quantity"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
    li = li.assign(q_e2=q_e2)
    s = li.groupby("l_partkey")["q_e2"].agg(["sum", "size"])
    m = li.merge(s, left_on="l_partkey", right_index=True)
    keep = 5 * m["q_e2"].to_numpy(np.int64) * m["size"].to_numpy(np.int64) < m[
        "sum"
    ].to_numpy(np.int64)
    ref = (
        m[keep]
        .merge(part, left_on="l_partkey", right_on="p_partkey")
        .groupby("p_brand")
        .size()
    )
    got = out.set_index("p_brand")["n_items"]
    assert got.to_dict() == ref.to_dict()
    assert _df(relational.small_quantity_revenue(SF, n_routes=5)).equals(out)
