"""Round-2 regression: the DISTRIBUTED LSH pair generation (explode →
bounded-cardinality groupby → per-bucket vectorized verify) must produce
byte-identical tables to the round-1 driver-side implementation, whose
outputs at sf0.01 are snapshotted in tests/data/ (VERDICT.md next-round #2).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frontera_ray.ops import dedup

SF = "/root/testdata/sf0.01"
DATA = os.path.join(os.path.dirname(__file__), "data")


def _expect(name: str) -> pa.Table:
    return pq.read_table(os.path.join(DATA, f"r1_{name}_sf001.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_pairs_byte_identical():
    """Snapshot regenerated in round 4: the shingle hash moved from
    per-gram md5 of joined strings to the vectorized splitmix token fold
    (VERDICT r3 #5), legitimately changing est_jaccard values. Ground
    truth is the lock-stepped SQL oracle (test_sql_parity); this snapshot
    pins byte-stability against future refactors."""
    got = dedup.minhash_lsh_pairs(SF)
    assert got.equals(
        pq.read_table(os.path.join(DATA, "r4_minhash_lsh_pairs_sf001.parquet"))
    )


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_byte_identical_at_round1_params():
    # round 1 ran max_hamming=8 with a 256 hot-bucket cap; the new default
    # is (7, no cap) — exact under the 8-chunk pigeonhole bound + oracled
    got = dedup.simhash_pairs(SF, max_hamming=8, bucket_cap=256)
    assert got.equals(_expect("simhash_pairs"))


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_pairs_byte_identical():
    """Snapshot regenerated in round 4 (same fold rework as the minhash
    snapshot above; oracle parity is the ground truth)."""
    got = dedup.ngram_jaccard_pairs(SF)
    assert got.equals(
        pq.read_table(os.path.join(DATA, "r4_ngram_jaccard_pairs_sf001.parquet"))
    )


@pytest.mark.usefixtures("ray_session")
def test_simhash_default_is_superset_of_capped():
    """Sanity: dropping the cap + tightening the radius keeps every pair a
    true ≤7-hamming pair and finds ALL of them (cross-checked brute force)."""
    import numpy as np

    got = dedup.simhash_pairs(SF).to_pandas()
    sig = dedup.simhash_signatures(SF).to_pandas()
    vals = sig["simhash"].map(lambda h: int(h, 16)).to_numpy(dtype=np.uint64)
    ids = sig["doc_id"].to_numpy()
    order = np.argsort(ids)
    ids, vals = ids[order], vals[order]
    n = len(ids)
    iu = np.triu_indices(n, k=1)
    d = dedup._hamming64(vals[iu[0]], vals[iu[1]])
    ok = d <= 7
    brute = sorted(
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])), int(dd))
        for i, j, dd in zip(iu[0][ok], iu[1][ok], d[ok])
    )
    assert [tuple(r) for r in got.to_numpy()] == brute


@pytest.mark.usefixtures("ray_session")
def test_clean_corpus_driver_holds_only_pair_scale_rows():
    """Round-3 (VERDICT r2 #1): clean_corpus must never materialize an
    O(corpus) structure on the driver — only the verified pair list and
    the pair-endpoint slice of the winner set. The cap is below even the
    cleaned-result row count (266 at sf0.01; the full winner set is larger
    still), so the old winner-set to_pandas would trip it."""
    from frontera_ray.ops import corpus

    out = corpus.clean_corpus(SF, _max_driver_rows=200).to_pandas()
    assert list(out.columns) == ["doc_id", "n_tokens"]
    assert len(out) > 200  # the RESULT outgrows the declared driver cap


@pytest.mark.usefixtures("ray_session")
def test_signature_dataset_computed_once_per_process():
    """Round-3 (VERDICT r2 #2): minhash_lsh_pairs / ngram_jaccard_pairs /
    clean_corpus share ONE materialized signature Dataset per sf_dir."""
    dedup._SIG_CACHE.clear()
    a = dedup.cached_signatures(SF)
    b = dedup.cached_signatures(SF)
    assert a is b
    dedup.minhash_lsh_pairs(SF)  # consumes the cache, does not replace it
    assert dedup.cached_signatures(SF) is a


@pytest.mark.usefixtures("ray_session")
def test_embedding_pairs_blocked_matches_unblocked():
    """The blocked upper-triangle matmul (block ≪ group size) must emit
    exactly the same pair table as the default block through the REAL op."""
    full = dedup.embedding_dup_pairs(SF)
    tiny = dedup.embedding_dup_pairs(SF, block=7)
    assert tiny.equals(full)


@pytest.mark.usefixtures("ray_session")
def test_labelprop_matches_union_find():
    """The distributed min-label-propagation clustering must emit exactly
    the driver union-find's (doc_id, rep_id) table — same components, same
    canonical min-id representative."""
    uf = dedup.minhash_cluster_reps(SF)
    lp = dedup.cluster_reps_labelprop(SF)
    assert lp.equals(uf)


@pytest.mark.usefixtures("ray_session")
def test_repetition_scores_float_association_matches_oracle(tmp_path):
    """ADVICE r3: floor(mx/nb*1e6+0.5) vs the oracle's floor(mx*1e6/nb+0.5)
    diverge by 1 for real pairs (mx=41, nb=640 → 64062 vs 64063). Build a
    doc that hits the divergent pair and check engine == DuckDB exactly."""
    import duckdb
    import pandas as pd

    from frontera_ray.ops import text as text_ops
    import __ray_entry__ as entrymod

    # 42 repeated tokens -> the top bigram occurs 41 times; pad with
    # unique fillers to reach exactly 641 tokens = 640 bigrams
    toks = ["x"] * 42 + [f"f{i}" for i in range(599)]
    assert len(toks) == 641
    doc = " ".join(toks)
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([doc], pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "documents.parquet"))

    eng = text_ops.repetition_scores(sf).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["repetition_scores"]).df()
    assert int(eng["top_bigram_frac_e6"].iloc[0]) == 64063
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True)[want.columns.tolist()].astype("int64"),
        want.astype("int64"),
    )


@pytest.mark.usefixtures("ray_session")
def test_graph_ops_invariant_to_route_count():
    """Round-4 (VERDICT r3 #4): the message passes group by
    node % n_routes with vectorized within-group sends. The route count
    is a pure partitioning knob — outputs must be identical for any
    value (1 route = everything in one group; 4 exercises multi-node
    groups hard)."""
    base_lp = dedup.cluster_reps_labelprop(SF)
    assert dedup.cluster_reps_labelprop(SF, n_routes=4).equals(base_lp)
    base_pr = dedup.pagerank_pairs(SF)
    assert dedup.pagerank_pairs(SF, n_routes=3).equals(base_pr)


@pytest.mark.usefixtures("ray_session")
def test_pair_table_computed_once_per_process():
    """Round-4: the verified-pair TABLE is cached per (sf_dir, threshold,
    cap) — clean_corpus / cluster_reps / repeat calls reuse it. The
    Dataset-returning variant stays uncached (distributed consumers)."""
    dedup._PAIRS_CACHE.clear()
    a = dedup.minhash_lsh_pairs(SF)
    b = dedup.minhash_lsh_pairs(SF)
    assert a is b
    c = dedup.minhash_lsh_pairs(SF, threshold=0.2)
    assert c is not a
    assert c is dedup.minhash_lsh_pairs(SF, threshold=0.2)
