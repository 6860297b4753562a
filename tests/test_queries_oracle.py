"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.001 and compare the SQL-expressible ones against their oracle_sql()
via DuckDB (row count + schema + order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _oracle_keys():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_keys())
def test_sql_parity(contract, con, name):
    queries, oracles = contract
    ray_df = _canon(_to_df(queries[name](SF_DIR)))
    sql_df = _canon(con.sql(oracles[name]).df())
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: cols {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"{name}.{c} float mismatch"
        else:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_rows_only_queries_run(contract):
    """Non-SQL entries: run, non-empty where expected, deterministic."""
    queries, oracles = contract
    rows_only = [k for k in queries if k not in oracles and not k.startswith("crawl_")]
    for name in rows_only:
        df = _to_df(queries[name](SF_DIR))
        assert df is not None, name
        assert len(df.columns) > 0, name


def test_lang_id_sane(contract):
    queries, _ = contract
    import pyarrow.parquet as pq

    df = _to_df(queries["lang_id"](SF_DIR))
    assert set(df.columns) == {"doc_id", "lang_pred"}
    n_docs = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows
    assert len(df) == n_docs
    assert df["lang_pred"].isin(["en", "de", "fr", "unk"]).all()


def test_ann_lsh_recall(contract):
    """LSH ANN must hit reasonable recall vs brute force on this data."""
    queries, _ = contract
    brute = _to_df(queries["ann_bruteforce"](SF_DIR))
    lsh = _to_df(queries["ann_lsh"](SF_DIR))
    b = set(zip(brute["query_id"], brute["vec_id"]))
    l = set(zip(lsh["query_id"], lsh["vec_id"]))
    recall = len(b & l) / max(1, len(b))
    assert recall >= 0.2, f"LSH recall {recall}"  # 1-bit probing, small data


def test_ann_ivf_recall(contract):
    """IVF ANN (coarse-quantizer cells, n_probe nearest) vs brute force."""
    queries, _ = contract
    brute = _to_df(queries["ann_bruteforce"](SF_DIR))
    ivf = _to_df(queries["ann_ivf"](SF_DIR))
    b = set(zip(brute["query_id"], brute["vec_id"]))
    v = set(zip(ivf["query_id"], ivf["vec_id"]))
    recall = len(b & v) / max(1, len(b))
    assert recall >= 0.4, f"IVF recall {recall}"


def test_entry_and_crawl_queries(contract):
    import __ray_entry__ as e

    out = e.entry()
    df = _to_df(out)
    assert len(df) > 0
    assert {"url", "text", "fp64"} <= set(df.columns)
    # byte-identity invariant against the REAL testdata source: every
    # crawled page's text is verbatim a documents.text value
    doc_texts = set(pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"])
    for url, text in zip(df["url"], df["text"]):
        if not url.endswith("robots.txt"):
            assert text in doc_texts, f"text mutated for {url}"
    queries, _ = contract
    order = _to_df(queries["crawl_order_bfs"](SF_DIR))
    assert len(order) > 0
    seen = _to_df(queries["crawl_seen_set"](SF_DIR))
    assert len(seen) >= len(order["url"].unique())
    counters = _to_df(queries["crawl_counters"](SF_DIR))
    assert {"epoch", "partition", "metric", "value"} == set(counters.columns)
