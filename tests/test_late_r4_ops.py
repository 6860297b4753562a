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
