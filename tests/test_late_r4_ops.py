"""Late round-4 operator properties beyond SQL parity: route-count
invariance for the routed window ops (the partitioning knob must never
change results), with-replacement semantics for grouped_sample_replace,
and structural invariants for bigram_lift / embedding_norms."""

import pandas as pd
import pytest

from frontera_ray.ops import ann, relational, sketches, text

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset) or not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    return (
        res.sort_values(list(res.columns), kind="mergesort").reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_routed_window_ops_invariant_to_route_count():
    """route = user_id % n_routes is a pure partitioning knob for
    lead_deltas and first_last_values — outputs identical at any count
    (1 route = one group; 5 exercises multi-user groups hard)."""
    assert _df(relational.lead_deltas(SF, n_routes=5)).equals(
        _df(relational.lead_deltas(SF))
    )
    assert _df(relational.first_last_values(SF, n_routes=1)).equals(
        _df(relational.first_last_values(SF))
    )


@pytest.mark.usefixtures("ray_session")
def test_grouped_sample_replace_semantics():
    out = sketches.grouped_sample_replace(SF, k=8).to_pandas()
    events = pd.read_parquet(f"{SF}/events.parquet")
    n_types = events["event_type"].nunique()
    # exactly k draws per stratum, labeled 0..k-1
    assert len(out) == 8 * n_types
    assert sorted(out["draw"].unique().tolist()) == list(range(8))
    # every winner is a real event of its stratum carrying its real value
    m = out.merge(events, on=["event_id", "event_type"], suffixes=("", "_src"))
    assert len(m) == len(out)
    assert (m["value"] == m["value_src"]).all()
    # deterministic across runs (hash priorities, no RNG state)
    assert sketches.grouped_sample_replace(SF, k=8).to_pandas().equals(out)


@pytest.mark.usefixtures("ray_session")
def test_bigram_lift_structural_invariants():
    out = text.bigram_lift(SF, k=10).to_pandas()
    assert len(out) == 10
    # a bigram can never outnumber either of its unigrams
    assert (out["c12"] <= out[["c1", "c2"]].min(axis=1)).all()
    assert (out["lift_e6"] > 0).all()
    # ranking is a prefix property: k=10 is the head of k=11
    more = text.bigram_lift(SF, k=11).to_pandas()
    pd.testing.assert_frame_equal(more.iloc[:10].reset_index(drop=True), out)


@pytest.mark.usefixtures("ray_session")
def test_embedding_norms_covers_corpus():
    out = ann.embedding_norms(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label"])
    assert int(out["n"].sum()) == len(emb)
    assert set(out["label"]) == set(emb["label"].unique())
    assert (out["min_norm2_e6"] <= out["avg_norm2_e6"]).all()
    assert (out["avg_norm2_e6"] <= out["max_norm2_e6"]).all()


@pytest.mark.usefixtures("ray_session")
def test_nth_value_events_route_invariance_and_semantics():
    """Round-5: route count is a pure partitioning knob, and the n-th row
    matches a pandas row_number()=n reference."""
    out = _df(relational.nth_value_events(SF, n=3))
    assert _df(relational.nth_value_events(SF, n=3, n_routes=1)).equals(out)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ref = ev.groupby("user_id").nth(2).reset_index()
    ref = ref[ref["user_id"].map(ev.groupby("user_id").size()) >= 3]
    assert len(out) == len(ref)
    m = out.merge(ref, left_on=["user_id", "nth_event_id"],
                  right_on=["user_id", "event_id"])
    assert len(m) == len(out)
    import numpy as np
    assert (m["nth_value_e4"] == np.floor(m["value"] * 10_000 + 0.5)).all()


@pytest.mark.usefixtures("ray_session")
def test_trigram_lift_structure():
    """Round-5: every winner trigram's two component bigrams exist with
    c12, c23 >= c123, and the lift matches the integer formula."""
    import numpy as np

    out = text.trigram_lift(SF, k=20).to_pandas()
    assert len(out) == 20
    assert (out["c12"] >= out["c123"]).all()
    assert (out["c23"] >= out["c123"]).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = docs["text"].str.split(" ")
    n_total = int(sum(max(len(t) - 2, 0) for t in toks))
    lift = np.floor(
        (n_total * out["c123"].to_numpy(np.int64)).astype(np.float64)
        * 1_000_000.0
        / (out["c12"].to_numpy(np.int64) * out["c23"].to_numpy(np.int64)).astype(np.float64)
        + 0.5
    ).astype(np.int64)
    assert (out["lift_e6"].to_numpy() == lift).all()
    # spot-check one trigram count against a direct pandas scan
    w1, w2, w3 = out.loc[0, ["w1", "w2", "w3"]]
    direct = sum(
        1
        for t in toks
        for i in range(len(t) - 2)
        if t[i] == w1 and t[i + 1] == w2 and t[i + 2] == w3
    )
    assert direct == out.loc[0, "c123"]


@pytest.mark.usefixtures("ray_session")
def test_filter_funnel_monotone_and_exact():
    """filter_funnel: cumulative-AND counts are monotone non-increasing,
    totals cover the corpus, and every column matches a direct pandas
    recompute of the rule stack (token window, >=2 stopwords,
    avg-token-length window with the repo x*1.0/n*1e6 association)."""
    import numpy as np

    out = text.filter_funnel(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert out["n_total"].sum() == len(docs)
    assert (out["n_total"] >= out["n_len_ok"]).all()
    assert (out["n_len_ok"] >= out["n_stop_ok"]).all()
    assert (out["n_stop_ok"] >= out["n_toklen_ok"]).all()
    # the thresholds must actually discriminate on this corpus
    assert out["n_toklen_ok"].sum() < out["n_total"].sum()
    assert out["n_toklen_ok"].sum() > 0

    toks = docs["text"].str.split(" ")
    nt = toks.str.len().to_numpy(np.int64)
    stop = {"the", "a", "to", "of", "and"}
    nstop = np.array([sum(1 for w in t if w in stop) for t in toks], np.int64)
    nch = docs["text"].str.len().to_numpy(np.int64)
    atl = np.floor(
        (nch - (nt - 1)) / np.maximum(nt, 1).astype(np.float64) * 1_000_000 + 0.5
    ).astype(np.int64)
    m1 = (nt >= 30) & (nt <= 90)
    m2 = m1 & (nstop >= 2)
    m3 = m2 & (atl >= 3_000_000) & (atl <= 8_000_000)
    ref = (
        pd.DataFrame(
            {
                "source": docs["source"],
                "n_total": 1,
                "n_len_ok": m1.astype(np.int64),
                "n_stop_ok": m2.astype(np.int64),
                "n_toklen_ok": m3.astype(np.int64),
            }
        )
        .groupby("source", as_index=False)
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    got = out.sort_values("source").reset_index(drop=True)[ref.columns]
    assert got.astype(np.int64, errors="ignore").equals(ref.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority_matches_pandas():
    """shipping_priority (TPC-H Q3 shape): exact match against a direct
    pandas recompute with the same integer-exact revenue export and the
    same (revenue desc, date, orderkey) tie-break."""
    import numpy as np

    out = relational.shipping_priority(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    line = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = np.datetime64("1998-01-01")
    o = orders[orders["o_orderdate"] < cutoff].merge(
        cust[cust["c_mktsegment"] == "BUILDING"],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    l = line[line["l_shipdate"] > cutoff].copy()
    l["revenue_e4"] = np.floor(
        (l["l_extendedprice"] * (1.0 - l["l_discount"])).to_numpy(np.float64)
        * 10_000
        + 0.5
    ).astype(np.int64)
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    ref = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False)[
            "revenue_e4"
        ]
        .sum()
        .sort_values(
            ["revenue_e4", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(10)
        .reset_index(drop=True)
    )
    assert len(out) == 10
    assert out[["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_e4"]].equals(
        ref[["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_e4"]]
    )


@pytest.mark.usefixtures("ray_session")
def test_local_supplier_volume_matches_pandas():
    """local_supplier_volume (TPC-H Q5 shape): exact match against a
    direct pandas recompute (local-supplier predicate, date window,
    integer-exact revenue), and route-count invariance of the two
    shuffle joins."""
    import numpy as np

    out = relational.local_supplier_volume(SF).to_pandas()
    assert _df(relational.local_supplier_volume(SF, n_routes=7)).equals(_df(out))

    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    line = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    o = orders[
        (orders["o_orderdate"] >= np.datetime64("1996-01-01"))
        & (orders["o_orderdate"] < np.datetime64("1999-01-01"))
    ].merge(cust, left_on="o_custkey", right_on="c_custkey")
    l = line.copy()
    l["revenue_e4"] = np.floor(
        (l["l_extendedprice"] * (1.0 - l["l_discount"])).to_numpy(np.float64) * 10_000
        + 0.5
    ).astype(np.int64)
    j = (
        l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["s_nationkey"] == j["c_nationkey"]]
    j = j.merge(nat, left_on="s_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )
    ref = (
        j.groupby(["r_name", "n_name"], as_index=False)["revenue_e4"]
        .sum()
        .sort_values(["r_name", "n_name"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert out[["r_name", "n_name", "revenue_e4"]].equals(ref)
