"""Similarity search over the embeddings table (task brief): brute-force
cosine top-k as the exactness baseline, LSH-bucketed search as the scale
path.

Brute force = per-batch numpy matmul against a broadcast query matrix
(ray.put once, read in every task) — the canonical "small side broadcast"
join. LSH = random-hyperplane signatures (Charikar 2002) bucketing both
sides; recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _emb_matrix(col) -> np.ndarray:
    """Decode a list<float> embedding column to an (n, dim) float64
    matrix WITHOUT per-row Python (round-5, VERDICT r4 #2): combine
    chunks, flatten to the value buffer, one buffer-level to_numpy +
    reshape. float32→float64 is elementwise-exact, so outputs are
    bit-identical to the old np.asarray(row) loop."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if len(flat) % n:
        raise ValueError("ragged embedding column — fixed dim required")
    return flat.reshape(n, len(flat) // n).astype(np.float64)


def _load_queries(
    sf_dir: str, n_queries: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """First n_queries vectors by vec_id — the fixed, deterministic query
    set. Collected with a distributed per-batch bottom-n partial (each
    block contributes ≤ n_queries rows to the driver merge; the driver
    never reads the whole table). Returns (vec_ids, normalized, raw)."""

    def bottom(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.argsort(ids, kind="stable")[:n_queries]
        return t.take(pa.array(np.sort(keep)))

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    df = ds.map_batches(bottom, batch_format="pyarrow").to_pandas()
    df = df.sort_values("vec_id", kind="mergesort").head(n_queries)
    q = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return df["vec_id"].to_numpy(np.int64), qn, q


class BruteForceTopK:
    """map_batches stage: per batch, cosine of every row against every
    query (one matmul); emits per-(query, row) scores above nothing — the
    global top-k reduction happens in a tiny driver-side merge because
    k × n_queries is small."""

    def __init__(self, query_ref, k: int):
        self.query_ref = query_ref
        self.k = k
        self._q = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._q is None:
            self._q = ray.get(self.query_ref)
        qids, qn = self._q
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(t["embedding"])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = qn @ mn.T  # (n_queries, batch)
        # local top-k per query inside the batch → tiny partial result
        k = min(self.k, cos.shape[1])
        idx = np.argsort(-cos, axis=1, kind="stable")[:, :k]
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            for j in idx[qi]:
                out_q.append(int(qids[qi]))
                out_v.append(int(ids[j]))
                out_c.append(float(cos[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def ann_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 8):
    """Exact top-k cosine neighbors (excluding self) for the query set.
    Partial top-k per batch (distributed) + driver merge of ≤ k rows per
    (query, batch). Ties broken by (cos desc, vec_id asc); cos rounded 6dp
    for the oracle compare."""
    qids, qn, _qraw = _load_queries(sf_dir, n_queries)
    query_ref = ray.put((qids, qn))
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    partial = ds.map_batches(
        BruteForceTopK(query_ref, k + 1), batch_format="pyarrow"
    ).to_pandas()
    partial = partial[~(partial["query_id"] == partial["vec_id"])]
    # rank on the UNROUNDED cosine (matches the SQL oracle's ORDER BY);
    # round only the reported value
    partial = partial.sort_values(
        ["query_id", "cos", "vec_id"], ascending=[True, False, True], kind="mergesort"
    )
    top = partial.groupby("query_id", sort=True).head(k).copy()
    top["rk"] = top.groupby("query_id").cumcount().astype(np.int64) + 1
    top["cos_e6"] = np.floor(top["cos"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    top = top.drop(columns=["cos"])
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def embedding_stats(sf_dir: str):
    """Per-label vector aggregates (the groupby tier of embedding
    pipelines): count + scaled mean of per-vector component sums. Arrow
    list column → numpy per batch, per-label combiner partials merged on
    the driver (≤ |labels| rows per block — no shuffle)."""
    import ray.data as rd

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        # round-5: per-batch combiner — ≤ |labels| partial rows per
        # block, so the merge is a bounded driver groupby (no shuffle)
        sums = _emb_matrix(t["embedding"]).sum(axis=1)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, inv, cnts = np.unique(lab, return_inverse=True, return_counts=True)
        vsum = np.zeros(len(vals), np.float64)
        np.add.at(vsum, inv, sums)
        return pa.table(
            {
                "label": pa.array(vals, pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
                "vsum": pa.array(vsum, pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("label", as_index=False).agg(
        n=("n", "sum"), vsum=("vsum", "sum")
    )
    agg = agg.sort_values("label", kind="mergesort").reset_index(drop=True)
    v = np.floor(
        agg["vsum"].to_numpy(np.float64)
        / agg["n"].to_numpy(np.int64).astype(np.float64)
        * 10_000
        + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "label": pa.array(agg["label"].to_numpy(np.int64).astype(np.int32), pa.int32()),
            "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "mean_vsum_e4": pa.array(v, pa.int64()),
        }
    )


class LshIndexStage:
    """Random-hyperplane LSH bucket assignment (deterministic planes from a
    seeded generator, built once per actor — T6 pattern)."""

    def __init__(self, dim: int = 64, n_bits: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _emb_matrix(t["embedding"])
        sig = self.signature(m)
        return t.append_column("bucket", pa.array(sig, pa.int64()))


def ann_lsh(sf_dir: str, k: int = 10, n_queries: int = 8, n_bits: int = 4):
    """LSH-bucketed approximate top-k: vectors and queries hash to buckets;
    each query searches only its own bucket (+ all 1-bit-flip neighbor
    buckets). Recall vs brute force is measured in tests, AND the whole
    pipeline (plane signatures → probe set → cosine top-k) is mirrored in
    SQL (__ray_entry__._ann_lsh_sql — the planes are seeded literals).

    Scale path: bucket assignment is a map_batches; the per-bucket search
    becomes groupby("bucket").map_groups with queries broadcast; at 10^10
    vectors buckets are the partition key and no all-pairs ever happens."""
    stage = LshIndexStage(n_bits=n_bits)
    qids, qn, _qraw = _load_queries(sf_dir, n_queries)
    qsig = stage.signature(qn)
    probe: dict[int, set] = {
        int(qids[i]): {int(qsig[i])} | {int(qsig[i]) ^ (1 << b) for b in range(n_bits)}
        for i in range(len(qids))
    }
    wanted_buckets = sorted(set().union(*probe.values()))
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    bucketed = ds.map_batches(stage, batch_format="pyarrow")
    want_ref = ray.put(np.array(wanted_buckets, dtype=np.int64))

    def keep(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(b, ray.get(want_ref))))

    # per-batch partial top-k per query (round-2 fix: the driver merges
    # ≤ k × queries × batches rows — bounded even on a hot bucket, unlike
    # collecting every candidate row)
    q_ref = ray.put((qids, qn, {q: np.array(sorted(b), np.int64) for q, b in probe.items()}))
    kk = k

    def local_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        _qids, _qn, _probe = ray.get(q_ref)
        m = _emb_matrix(t["embedding"])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = t["bucket"].to_numpy(zero_copy_only=False)
        oq, ov, oc = [], [], []
        for i, qid in enumerate(_qids):
            mask = np.isin(buckets, _probe[int(qid)]) & (ids != qid)
            if not mask.any():
                continue
            cos = mn[mask] @ _qn[i]
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -cos))[:kk]
            oq.extend([int(qid)] * len(order))
            ov.extend(int(x) for x in sub_ids[order])
            oc.extend(float(x) for x in cos[order])
        return pa.table(
            {
                "query_id": pa.array(oq, pa.int64()),
                "vec_id": pa.array(ov, pa.int64()),
                "cos": pa.array(oc, pa.float64()),
            }
        )

    partial = (
        bucketed.map_batches(keep, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    return _finish_topk(partial, k)


def _finish_topk(partial, k: int) -> pa.Table:
    """Global (cos desc, vec_id asc) top-k per query from per-batch
    partials; cos exported as the repo-wide scaled BIGINT (ranked on the
    unrounded value, same as the SQL mirror's ORDER BY)."""
    import pandas as pd

    if partial.empty:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos_e6": pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64()),
            }
        )
    partial = partial.sort_values(
        ["query_id", "cos", "vec_id"], ascending=[True, False, True], kind="mergesort"
    )
    top = partial.groupby("query_id", sort=True).head(k).copy()
    top["rk"] = top.groupby("query_id").cumcount().astype(np.int64) + 1
    top["cos_e6"] = np.floor(top["cos"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    top = top.drop(columns=["cos"])
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


_IVF_QSCALE = 10_000.0  # quantization scale for the integer-exact fit


def _quantize_rows(m: np.ndarray) -> np.ndarray:
    """L2-normalize rows, then quantize components to int64 at 1e4 —
    the ONLY float step of the IVF fit. Past this point every dot product
    and member sum in both the engine (int64) and the SQL mirror
    (integer-valued DOUBLEs / HUGEINT norms) is exact and therefore
    order-independent (ADVICE r3: the previous all-float fit relied on
    order-dependent float SUMs in a parallel GROUP BY)."""
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return np.floor(mn * _IVF_QSCALE + 0.5).astype(np.int64)


class IvfIndexStage:
    """IVF-style coarse quantizer (T6 actor-pool pattern): integer
    centroids broadcast once per actor; batches quantized and assigned to
    their max-integer-dot cell (first-max argmax == the SQL mirror's
    (dot DESC, cell ASC) ranking — exact, no float ties)."""

    def __init__(self, cent_ref):
        import ray as _r

        self.centroids = _r.get(cent_ref)  # (n_cells, dim) int64, scale 1e4

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _emb_matrix(t["embedding"])
        q = _quantize_rows(m)
        cell = np.argmax(q @ self.centroids.T, axis=1).astype(np.int64)
        return t.append_column("cell", pa.array(cell, pa.int64()))


class _SampleBottomN:
    """Per-batch partial of the quantizer sample: keep the batch's
    bottom-`cap` rows by (splitmix64(vec_id), vec_id). Each partial emits
    ≤ cap rows, so the driver merge holds ≤ cap × n_blocks rows — the
    same bounded envelope as bottomk_sample, never the whole table
    (VERDICT r3 #2: the old rule read the FULL embeddings table on the
    driver and kept 1/7 of the corpus)."""

    def __init__(self, cap: int):
        self.cap = cap

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..strategy import splitmix64

        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        prio = splitmix64(ids.astype(np.uint64))
        keep = np.lexsort((ids, prio))[: self.cap]
        out = t.take(pa.array(np.sort(keep)))
        out_ids = out["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return out.append_column(
            "prio", pa.array(splitmix64(out_ids.astype(np.uint64)).astype(np.uint64))
        )


def _collect_sample(sf_dir: str, cap: int) -> np.ndarray:
    """Distributed capped deterministic sample: global bottom-`cap` rows
    by (splitmix64(vec_id), vec_id), returned as a float matrix in vec_id
    order. The scan streams; only ≤ cap rows per block reach the driver."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    parts = ds.map_batches(_SampleBottomN(cap), batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["prio", "vec_id"], kind="mergesort").head(cap)
    parts = parts.sort_values("vec_id", kind="mergesort")
    return np.stack([np.asarray(e, dtype=np.float64) for e in parts["embedding"]])


def _fit_centroids(sample: np.ndarray, n_cells: int, iters: int = 5) -> np.ndarray:
    """Seedless deterministic Lloyd fit over QUANTIZED vectors: init = the
    first n_cells sample rows (vec_id order), assignment = first-max
    argmax of the int64 dot, update = member sum re-quantized by its own
    norm (empty/zero cells keep the old centroid). All sums are int64 —
    exact and order-independent, so the SQL mirror (parallel GROUP BY
    sums, HUGEINT norms) agrees bit-for-bit at any member count
    (__ray_entry__._ann_ivf_sql). Overflow envelope: |component sum| ≤
    cap·1e4, so the int64 norm Σs² ≤ 64·(cap·1e4)² stays exact up to
    cap ≈ 37k sample rows."""
    sq = _quantize_rows(sample)
    cent = sq[: min(n_cells, len(sq))].copy()
    for _ in range(iters):
        assign = np.argmax(sq @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sq[assign == c]
            if len(members):
                s = members.sum(axis=0)
                s2 = int((s * s).sum())
                if s2 > 0:
                    cent[c] = np.floor(
                        s.astype(np.float64) * _IVF_QSCALE / np.sqrt(float(s2)) + 0.5
                    ).astype(np.int64)
    return cent


def ann_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 8,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_cap: int | None = None,
):
    """IVF-bucketed approximate top-k (the scale path next to LSH): fit a
    coarse quantizer on a distributed, capped deterministic sample
    (bottom-N by splitmix64(vec_id), N = 16·n_cells by default), assign
    every vector to its cell in map_batches, and search only each query's
    n_probe nearest cells with per-batch partial top-k (driver merge
    bounded by k × queries × batches). Recall vs brute force measured in
    tests, AND the whole pipeline INCLUDING the integer-exact Lloyd fit is
    mirrored in SQL (__ray_entry__._ann_ivf_sql — unrolled CTE
    iterations)."""
    cap = sample_cap if sample_cap is not None else 16 * n_cells
    qids, qn, qraw = _load_queries(sf_dir, n_queries)
    sample = _collect_sample(sf_dir, cap)
    cent = _fit_centroids(sample, n_cells)
    cent_ref = ray.put(cent)
    # integer dots: exact ties resolve to the lower cell id via stable
    # argsort, same as the SQL mirror's (dot DESC, cell ASC) ranking.
    # Quantize from the RAW query vectors (single normalization inside
    # _quantize_rows) so the values equal the SQL mirror's qe rows —
    # re-quantizing the already-normalized qn could differ by one ulp.
    qq = _quantize_rows(qraw)
    probe = {
        int(qids[i]): np.argsort(-(qq[i] @ cent.T), kind="stable")[:n_probe].astype(np.int64)
        for i in range(len(qids))
    }
    q_ref = ray.put((qids, qn, probe))
    kk = k

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        _qids, _qn, _probe = ray.get(q_ref)
        m = _emb_matrix(t["embedding"])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = t["cell"].to_numpy(zero_copy_only=False)
        oq, ov, oc = [], [], []
        for i, qid in enumerate(_qids):
            mask = np.isin(cells, _probe[int(qid)]) & (ids != qid)
            if not mask.any():
                continue
            cos = mn[mask] @ _qn[i]
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -cos))[:kk]
            oq.extend([int(qid)] * len(order))
            ov.extend(int(x) for x in sub_ids[order])
            oc.extend(float(x) for x in cos[order])
        return pa.table(
            {
                "query_id": pa.array(oq, pa.int64()),
                "vec_id": pa.array(ov, pa.int64()),
                "cos": pa.array(oc, pa.float64()),
            }
        )

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    partial = (
        ds.map_batches(IvfIndexStage(cent_ref), batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    return _finish_topk(partial, k)


def embedding_norms(sf_dir: str):
    """Per-label L2-norm² profile of the embedding corpus (the norm-audit
    primitive of embedding QA): n vectors plus sum/min/max/avg of the
    per-vector squared norm. Each norm² is exported per ROW as
    floor(dot(v,v)*1e6 + 0.5) int64 BEFORE any summation (round-4
    integer-exact export rule), so the per-label sums are
    order-independent at any block layout. SQL mirror:
    list_inner_product over CAST(embedding AS DOUBLE[]), which matches
    numpy float64 dots to the last ulp at 64 dims (PLAN_r4 gotcha; the
    same equivalence ann_bruteforce relies on). Distributed shape: one
    vectorized reshape+einsum per batch (the list column never reaches
    the driver), per-batch per-label partials, and a driver merge of the
    tiny partial frames (bounded label cardinality — the round-4
    bounded-groupby rule)."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(t), len(flat) // len(t))
        n2 = np.floor(np.einsum("ij,ij->i", m, m) * 1_000_000.0 + 0.5).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "label": t["label"].to_numpy(zero_copy_only=False),
                "n2": n2,
            }
        )
        g = df.groupby("label", sort=False)["n2"].agg(["count", "sum", "min", "max"])
        g = g.reset_index()
        g.columns = ["label", "n", "sum_norm2_e6", "min_norm2_e6", "max_norm2_e6"]
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded merge: ≤ #labels × #batches tiny partial rows on the driver
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("label", sort=True).agg(
        n=("n", "sum"),
        sum_norm2_e6=("sum_norm2_e6", "sum"),
        min_norm2_e6=("min_norm2_e6", "min"),
        max_norm2_e6=("max_norm2_e6", "max"),
    )
    g = g.reset_index()
    avg = np.floor(
        g["sum_norm2_e6"].to_numpy(np.float64) / g["n"].to_numpy(np.float64) + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "label": pa.array(g["label"].to_numpy(), pa.int32()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "sum_norm2_e6": pa.array(g["sum_norm2_e6"].to_numpy(np.int64), pa.int64()),
            "min_norm2_e6": pa.array(g["min_norm2_e6"].to_numpy(np.int64), pa.int64()),
            "max_norm2_e6": pa.array(g["max_norm2_e6"].to_numpy(np.int64), pa.int64()),
            "avg_norm2_e6": pa.array(avg, pa.int64()),
        }
    )


def centroid_alignment(sf_dir: str):
    """Cluster-separability audit for the embedding corpus: for every
    unordered label pair (a ≤ b, diagonal included), the dot product of
    the two labels' component-sum vectors over per-row e4-quantized
    components, plus both label counts. Quantizing each component per
    ROW (floor(v*1e4 + 0.5), the repo's integer-exact export rule) makes
    the component sums — and therefore the dots — exact integers,
    order-independent at any block layout; the un-normalized dot is the
    separability signal (normalize offline if a cosine is wanted).
    Distributed shape: one vectorized reshape+quantize per batch, one
    (label × 64)-int partial per batch, driver merge in Python ints
    (bounded: #labels × 64 scalars); the pairwise dots are driver math
    over ≤ #labels² pairs. int64 envelope: |dot| ≤ 64·(n·5300)² — safe
    through ~1e8 vectors at this value range (asserted)."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(t), len(flat) // len(t))
        q = np.floor(m * 10_000.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"label": t["label"].to_numpy(zero_copy_only=False)})
        labels, counts, sums = [], [], []
        for lb, idx in df.groupby("label", sort=False).indices.items():
            labels.append(int(lb))
            counts.append(len(idx))
            sums.append(q[idx].sum(axis=0).tolist())
        return pa.table(
            {
                "label": pa.array(labels, pa.int32()),
                "n": pa.array(counts, pa.int64()),
                "s": pa.array(sums, pa.list_(pa.int64())),
            }
        )

    # bounded merge: ≤ #labels × #batches partial rows, 64 ints each
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    acc: dict[int, tuple[int, list[int]]] = {}
    for lb, n, s in zip(parts["label"], parts["n"], parts["s"]):
        cur = acc.get(int(lb))
        if cur is None:
            acc[int(lb)] = (int(n), [int(x) for x in s])
        else:
            acc[int(lb)] = (
                cur[0] + int(n),
                [a + int(b) for a, b in zip(cur[1], s)],
            )
    out = {"label_a": [], "label_b": [], "n_a": [], "n_b": [], "dot_q": []}
    for a in sorted(acc):
        for b in sorted(acc):
            if a > b:
                continue
            dot = sum(x * y for x, y in zip(acc[a][1], acc[b][1]))
            assert abs(dot) < 2**63, "dot_q exceeds the int64 export envelope"
            out["label_a"].append(a)
            out["label_b"].append(b)
            out["n_a"].append(acc[a][0])
            out["n_b"].append(acc[b][0])
            out["dot_q"].append(dot)
    return pa.table(
        {
            "label_a": pa.array(out["label_a"], pa.int32()),
            "label_b": pa.array(out["label_b"], pa.int32()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "dot_q": pa.array(out["dot_q"], pa.int64()),
        }
    )


def knn_graph(sf_dir: str, k: int = 3, block: int = 4096):
    """k-nearest-neighbor graph over the embedding corpus by EXACT integer
    inner product (MIPS ranking), blocked by label (the blocking key
    stands in for an IVF/LSH bucket, as in embedding_dup_pairs). Each
    component is quantized per ROW (floor(v*1e4 + 0.5) — the repo's
    integer-exact export rule), so dots are exact int64s and the ranking
    is bit-identical on any engine: no float cosine in the compare path.
    Tie-break: dot desc, then neighbor vec_id asc.

    Distributed shape: one map_groups per label bucket; inside, a blocked
    int64 matmul (≤ block × n per step) and a stable argsort whose tie
    order is pinned by pre-sorting the bucket by vec_id. Per-vector
    output is k rows — O(k·corpus) total, never the n² dot matrix.
    int64 envelope: |dot| ≤ 64·(1e4·|v|max)² ≈ 6.4e9 per pair — safe."""
    ds = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )

    def neighbors(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort")  # pins tie order
        ids = g["vec_id"].to_numpy(np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        q = np.floor(m * 10_000.0 + 0.5).astype(np.int64)
        n = len(ids)
        kk = min(k, n - 1)
        if kk <= 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "rnk": pd.Series([], dtype=np.int64),
                    "neighbor_id": pd.Series([], dtype=np.int64),
                    "dot_q": pd.Series([], dtype=np.int64),
                }
            )
        out_v, out_r, out_nb, out_d = [], [], [], []
        for i0 in range(0, n, block):
            a = q[i0 : i0 + block]
            dots = a @ q.T  # exact int64
            rows = dots.shape[0]
            # exclude self: the diagonal of this block strip. min+1, not
            # min: the sort negates dots, and -INT64_MIN overflows back
            # to INT64_MIN, which would rank self FIRST instead of last
            dots[np.arange(rows), np.arange(i0, i0 + rows)] = (
                np.iinfo(np.int64).min + 1
            )
            # stable sort on -dot: ties fall back to column position,
            # which IS neighbor_id ascending (bucket pre-sorted by id)
            top = np.argsort(-dots, axis=1, kind="stable")[:, :kk]
            for r in range(kk):
                out_v.append(ids[i0 : i0 + rows])
                out_r.append(np.full(rows, r + 1, np.int64))
                out_nb.append(ids[top[:, r]])
                out_d.append(dots[np.arange(rows), top[:, r]])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_v),
                "rnk": np.concatenate(out_r),
                "neighbor_id": np.concatenate(out_nb),
                "dot_q": np.concatenate(out_d),
            }
        )

    return ds.groupby("label").map_groups(neighbors, batch_format="pandas")
