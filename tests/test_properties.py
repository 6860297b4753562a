"""Property-based tests (hypothesis) for the pure kernels — the invariants
the crawl's determinism rests on."""

import hashlib

import numpy as np
from hypothesis import given, settings, strategies as st

from frontera_ray.functions.urlnorm import canonicalize, extract_host
from frontera_ray.functions.fingerprint import (
    fp64,
    partition_for_host,
    sha1_hex,
    signed_crc32,
)
from frontera_ray.state.cuckoo import CuckooFilter
from frontera_ray.state.bloom import BloomFilter
from frontera_ray.strategy import splitmix64

url_text = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=60
)
hostish = st.from_regex(r"[a-z0-9]([a-z0-9.\-]{0,30}[a-z0-9])?", fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(host=hostish, path=url_text)
def test_canonicalize_idempotent(host, path):
    u = f"http://{host}/{path}"
    once = canonicalize(u)
    assert canonicalize(once) == once


@settings(max_examples=200, deadline=None)
@given(host=hostish)
def test_partition_stable_and_in_range(host):
    for n in (1, 2, 4, 32, 256):
        p = partition_for_host(host, n)
        assert 0 <= p < n
        assert p == partition_for_host(host, n)  # pure


@settings(max_examples=100, deadline=None)
@given(host=hostish, path=url_text)
def test_fp64_is_sha1_prefix(host, path):
    u = canonicalize(f"http://{host}/{path}")
    assert fp64(u) == int(sha1_hex(u)[:16], 16)
    assert sha1_hex(u) == hashlib.sha1(u.encode()).hexdigest()


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500,
        unique=True,
    )
)
def test_cuckoo_never_false_negative(keys):
    cf = CuckooFilter(capacity=2048)
    arr = np.array(keys, dtype=np.uint64)
    cf.add_batch(arr)
    assert cf.contains_batch(arr).all()
    # byte-stable roundtrip preserves membership
    cf2 = CuckooFilter.restore(cf.dump())
    assert cf2.contains_batch(arr).all()


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500,
        unique=True,
    )
)
def test_bloom_never_false_negative(keys):
    bf = BloomFilter(capacity=1024)
    arr = np.array(keys, dtype=np.uint64)
    bf.add_batch(arr)
    assert bf.contains_batch(arr).all()


@settings(max_examples=100, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**64 - 1))
def test_splitmix64_bijective_sample(x):
    """splitmix64 is a bijection — distinct inputs map to distinct outputs
    (spot-checked against neighbors)."""
    a = np.array([x, (x + 1) % 2**64], dtype=np.uint64)
    out = splitmix64(a)
    assert out[0] != out[1]


def _simhash_reference(text: str) -> int:
    """Independent simhash implementation (pure-python bit loop) used to
    cross-check ops/dedup.simhash_signatures' vectorized version."""
    counts = [0] * 64
    for w in text.split():
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if counts[b] > 0:
            v |= 1 << b
    return v


def test_simhash_matches_reference(ray_session):
    import pyarrow.parquet as pq

    from frontera_ray.ops.dedup import simhash_signatures

    sf = "/root/testdata/sf0.001"
    got = simhash_signatures(sf).to_pandas().set_index("doc_id")["simhash"]
    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for r in texts.head(50).itertuples():
        assert int(got.loc[r.doc_id], 16) == _simhash_reference(r.text)


# ---- round-4: the vectorized k-window shingle fold --------------------

def _naive_fold(toks_per_doc, k, short_fallback):
    """Scalar reference of dedup._fold_windows: per window, fold
    acc -> splitmix64(acc ^ th[pos]) over the k (or fewer) tokens."""
    from frontera_ray.ops.dedup import _token_hash_concat

    th, counts = _token_hash_concat(toks_per_doc)
    out, m = [], []
    start = 0
    for n in counts:
        if n >= k:
            wins = n - k + 1
        elif short_fallback:
            wins = 1 if n > 0 else 0
        else:
            wins = max(n - k + 1, 0)
        m.append(wins)
        for i in range(wins):
            acc = np.uint64(0)
            for j in range(k):
                if i + j < n:
                    acc = splitmix64(np.array([acc ^ th[start + i + j]]))[0]
            out.append(acc)
        start += n
    return np.array(out, np.uint64), np.array(m, np.int64)


tokens = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=3), min_size=0, max_size=12
)


@settings(max_examples=60, deadline=None)
@given(docs=st.lists(tokens, min_size=0, max_size=6), k=st.integers(2, 6),
       fallback=st.booleans())
def test_fold_windows_matches_scalar_reference(docs, k, fallback):
    from frontera_ray.ops.dedup import _fold_windows, _token_hash_concat

    th, counts = _token_hash_concat(docs)
    acc, m = _fold_windows(th, counts, k, short_fallback=fallback)
    ref_acc, ref_m = _naive_fold(docs, k, fallback)
    assert (m == ref_m).all()
    assert (acc == ref_acc).all()


# ---- round-5: the Arrow-native token-hash vocab pass ------------------

texts_ws = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12), min_size=0, max_size=8
)


@settings(max_examples=60, deadline=None)
@given(texts=texts_ws)
def test_token_hash_concat_arrow_matches_list_version(texts):
    """_token_hash_concat_arrow == _token_hash_concat over str.split()
    token lists for space-separated text — including empty docs,
    leading/trailing and doubled spaces (the empty-token filter)."""
    import pyarrow as pa

    from frontera_ray.ops.dedup import _token_hash_concat, _token_hash_concat_arrow

    th_ref, counts_ref = _token_hash_concat([x.split() for x in texts])
    th, counts = _token_hash_concat_arrow(pa.chunked_array([pa.array(texts, pa.string())]))
    assert (counts == counts_ref).all()
    assert (th == th_ref).all()
