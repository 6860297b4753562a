"""Deduplication operators over the documents table — the training-data-
pipeline ops the engine adds beyond the reference (task brief: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

All deterministic (hash-seeded, no RNG state), all expressed Ray-Data-first:
vectorized signature computation in map_batches, candidate generation via
groupby on (band, bucket) keys, verification vectorized per candidate group.

References (public): Broder, "On the resemblance and containment of
documents" (1997) — minhash/shingles; Gionis/Indyk/Motwani, "Similarity
search in high dimensions via hashing" (VLDB 1999) — LSH banding;
Charikar, "Similarity estimation techniques from rounding algorithms"
(STOC 2002) — simhash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..strategy import splitmix64

_NUM_PERM = 64
_BANDS = 16  # 16 bands × 4 rows
_ROWS = _NUM_PERM // _BANDS


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# ---------------------------------------------------------------- exact ----
def exact_dedup(sf_dir: str):
    """Exact dedup (A4/J3): content-hash column in map_batches, then ONE
    groupby on the hash — winner = min(doc_id). At 100 TB the shuffle moves
    only (hash, doc_id) pairs, never the text."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(hs, pa.string())})

    ds = ds.map_batches(h, batch_format="pyarrow")
    out = ds.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return out.drop_columns(["h"])


# ------------------------------------------------------------- shingles ----
def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of word k-shingles (distinct)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = {
        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") for g in grams
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


def _minhash_sig(sh: np.ndarray) -> np.ndarray:
    """64-perm minhash via splitmix64-mixed hash families (vectorized:
    one (n_shingles × n_perm) matrix per doc)."""
    if len(sh) == 0:
        return np.full(_NUM_PERM, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    seeds = np.arange(1, _NUM_PERM + 1, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    return splitmix64(sh[:, None] ^ seeds[None, :]).min(axis=0)


class MinHashStage:
    """Actor-pool map_batches stage: text → 64-perm signature, ONE row per
    doc. Stateful-setup pattern (T6): nothing heavy here, but the class
    form keeps the per-actor setup slot for a real tokenizer. Shingling +
    hashing is the CPU-dominant part of MinHash dedup and stays fully
    distributed."""

    def __init__(self, k: int = 5):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = [
            _minhash_sig(_shingle_hashes(text, self.k)).tobytes()
            for text in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "sig": pa.array(sigs, pa.binary())}
        )


def minhash_signatures(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(MinHashStage(), batch_format="pyarrow")


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5):
    """MinHash+LSH near-dup pairs: distributed shingle→minhash signatures
    (the CPU-heavy stage), then banding over the COMPACT signature table
    (n_docs × 520 B — 5 GB even at 10M docs): band keys vectorized, bucket
    self-merge, candidate pairs verified with full-signature estimated
    Jaccard ≥ threshold.

    Scale path (10^10 docs, documented per SURVEY.md §2.7): the banding
    step becomes explode-to-(band,key) rows → groupby((band,key)) →
    per-bucket pair emission — the same computation with the exchange done
    by Ray's hash shuffle instead of a driver merge; signatures stay the
    only payload either way."""
    sig_df = minhash_signatures(sf_dir).to_pandas()
    n = len(sig_df)
    if n == 0:
        return _empty_pairs("est_jaccard")
    sigs = np.frombuffer(b"".join(sig_df["sig"]), dtype=np.uint64).reshape(
        n, _NUM_PERM
    )
    ids = sig_df["doc_id"].to_numpy(np.int64)
    # band keys: md5 of each band's 4×8 bytes (vectorized-ish: one pass)
    from collections import defaultdict

    buckets: dict[tuple[int, bytes], list[int]] = defaultdict(list)
    for b in range(_BANDS):
        band = np.ascontiguousarray(sigs[:, b * _ROWS : (b + 1) * _ROWS])
        raw = band.tobytes()
        w = _ROWS * 8
        for i in range(n):
            buckets[(b, raw[i * w : (i + 1) * w])].append(i)
    cand = set()
    for members in buckets.values():
        if len(members) < 2 or len(members) > 256:
            continue  # singleton or capped hot bucket
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cand.add((members[x], members[y]))
    rows = []
    for i, j in cand:
        est = float((sigs[i] == sigs[j]).mean())
        if est >= threshold:
            a, b_ = int(ids[i]), int(ids[j])
            if a > b_:
                a, b_ = b_, a
            rows.append((a, b_, est))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "est_jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def _empty_pairs(score_col: str) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            score_col: pa.array([], pa.float64()),
        }
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.4, k: int = 3):
    """Exact n-gram Jaccard verification of LSH candidates: MinHash+LSH
    proposes, exact shingle-set Jaccard disposes. The exact pass touches
    only candidate pairs — never all-pairs."""
    cand = minhash_lsh_pairs(sf_dir, threshold=0.2)
    if isinstance(cand, pa.Table):
        cand_df = cand.to_pandas()
    else:
        cand_df = cand.to_pandas()
    if cand_df.empty:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    need = sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"]))
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    import ray

    need_ref = ray.put(np.array(need, dtype=np.int64))

    def only_needed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, ray.get(need_ref))))

    texts = docs.map_batches(only_needed, batch_format="pyarrow").to_pandas()
    shingles = {
        int(r.doc_id): set(_shingle_hashes(r.text, k).tolist())
        for r in texts.itertuples()
    }
    rows = []
    for r in cand_df.itertuples():
        sa, sb = shingles.get(int(r.doc_a)), shingles.get(int(r.doc_b))
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            rows.append((int(r.doc_a), int(r.doc_b), round(j, 6)))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# -------------------------------------------------------------- simhash ----
def simhash_signatures(sf_dir: str):
    """64-bit SimHash per document (Charikar 2002): token hash bits weighted
    ±1, sign → bit. Vectorized per batch over the token-hash matrix."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            toks = text.split()
            if not toks:
                out.append(0)
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    for w in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            sh = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(sh)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array([f"{x:016x}" for x in out], pa.string()),
            }
        )

    return ds.map_batches(sim, batch_format="pyarrow")


def simhash_pairs(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup candidates: 4×16-bit chunk index (pigeonhole —
    hamming ≤ 8 over 64 bits ⇒ at least one of 8 8-bit chunks equal; we use
    8 chunks of 8 bits) → bucket groupby → verify hamming distance."""
    sig = simhash_signatures(sf_dir).to_pandas()
    vals = sig["simhash"].map(lambda h: int(h, 16)).to_numpy(dtype=np.uint64)
    ids = sig["doc_id"].to_numpy()
    # chunk index (driver-side fine at sf scale; the Dataset form mirrors
    # minhash_lsh_pairs: explode chunk rows → groupby(chunk, key))
    from collections import defaultdict

    buckets = defaultdict(list)
    for i in range(len(ids)):
        v = int(vals[i])
        for c in range(8):
            buckets[(c, (v >> (8 * c)) & 0xFF)].append(i)
    seen = set()
    rows = []
    for bucket in buckets.values():
        if len(bucket) > 256:
            continue  # capped hot bucket
        for x in range(len(bucket)):
            for y in range(x + 1, len(bucket)):
                i, j = bucket[x], bucket[y]
                key = (int(ids[i]), int(ids[j])) if ids[i] < ids[j] else (int(ids[j]), int(ids[i]))
                if key in seen:
                    continue
                seen.add(key)
                d = int(bin(int(vals[i]) ^ int(vals[j])).count("1"))
                if d <= max_hamming:
                    rows.append((key[0], key[1], d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------- embedding cosine near-dup --
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup, blocked by label (the blocking key stands
    in for an LSH/IVF bucket): within each label group, one numpy matmul
    gives all pairwise cosines; pairs ≥ threshold survive. SQL-checkable via
    DuckDB list_cosine_similarity with the same blocking."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mm = m / norms
        cos = mm @ mm.T
        iu = np.triu_indices(len(ids), k=1)
        mask = cos[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo.astype(np.int64), "vec_b": hi.astype(np.int64)})

    out = ds.groupby("label").map_groups(pairs, batch_format="pandas")
    df = out.to_pandas()  # pair set is tiny; typed even when empty
    return pa.table(
        {
            "vec_a": pa.array(df.get("vec_a", []), pa.int64()),
            "vec_b": pa.array(df.get("vec_b", []), pa.int64()),
        }
    )
