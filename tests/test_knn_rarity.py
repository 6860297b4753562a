"""knn_graph / rarity_scores structural invariants beyond the SQL parity
that test_queries_oracle.py parametrizes."""

import numpy as np
import pandas as pd
import pytest

from frontera_ray.ops import ann, text

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_invariants():
    out = ann.knn_graph(SF, k=3).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    # exactly k rows per vector (every label group here has > k members)
    per_vec = out.groupby("vec_id").size()
    assert (per_vec == 3).all()
    assert len(per_vec) == len(emb)
    # never self as a neighbor
    assert (out["vec_id"] != out["neighbor_id"]).all()
    # ranks are 1..k with non-increasing dot within each vector
    s = out.sort_values(["vec_id", "rnk"])
    assert sorted(s["rnk"].unique().tolist()) == [1, 2, 3]
    d = s.groupby("vec_id")["dot_q"].apply(lambda x: (x.diff().dropna() <= 0).all())
    assert d.all()
    # neighbors stay within the anchor's label block
    lab = emb.set_index("vec_id")["label"]
    assert (lab[out["vec_id"]].to_numpy() == lab[out["neighbor_id"]].to_numpy()).all()
    # block size is a pure partitioning knob
    assert (
        ann.knn_graph(SF, k=3, block=7)
        .to_pandas()
        .sort_values(["vec_id", "rnk"])
        .reset_index(drop=True)
        .equals(s.reset_index(drop=True))
    )


@pytest.mark.usefixtures("ray_session")
def test_rarity_scores_invariants():
    out = text.rarity_scores(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(out) == len(docs)
    # exact recompute of one document's score from global counts
    toks = docs["text"].str.split(" ")
    flat = [w for t in toks for w in t]
    n_total = len(flat)
    counts = pd.Series(flat).value_counts()
    assert (out["n_tokens"].sum()) == n_total
    row = out[out["doc_id"] == docs["doc_id"].iloc[0]].iloc[0]
    expect = sum(n_total // counts[w] for w in toks.iloc[0])
    assert int(row["rarity"]) == expect
    # every token occurs at least once -> each contribution >= 1
    assert (out["rarity"] >= out["n_tokens"]).all()
