"""Mergeable sketches (SURVEY.md §2.5 A5) + deterministic sampling (§2.6 O5).

HyperLogLog: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007), dense 2^p registers, the
standard bias-corrected estimator. Sketches are built per batch inside
map_batches (one numpy pass) and merged associatively — the canonical
"emit one serialized sketch per batch, merge in a tiny second stage"
pattern for aggregation at scale.

Sampling: hash-based Bernoulli sampling (keep iff md5(key) mod M < k) —
deterministic, partition-independent, and SQL-expressible, unlike
ds.random_sample whose result depends on block structure.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..strategy import splitmix64


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_batch(self, keys: np.ndarray) -> None:
        h = splitmix64(keys.astype(np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of `rest` + 1  (capped by 64-p+1 via the OR)
        lz = np.zeros(len(rest), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        vals = rest.copy()
        done = np.zeros(len(rest), dtype=bool)
        for r in range(64 - self.p + 1):
            hit = ~done & ((vals & mask) != 0)
            lz[hit] = r + 1
            done |= hit
            vals = vals << np.uint64(1)
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting small-range fix
        return float(est)

    def dump(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def restore(cls, b: bytes) -> "HyperLogLog":
        obj = cls(b[0])
        obj.registers = np.frombuffer(b, dtype=np.uint8, offset=1).copy()
        return obj


def hll_distinct_users(sf_dir: str, p: int = 12):
    """Approximate distinct user_id count per event_type: one HLL sketch per
    (batch × type) emitted as bytes, merged in a small driver pass (sketch
    count = #batches × #types — tiny)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        types, blobs = [], []
        for et, g in df.groupby("event_type"):
            h = HyperLogLog(p)
            h.add_batch(g["user_id"].to_numpy(dtype=np.uint64))
            types.append(et)
            blobs.append(h.dump())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    merged: dict[str, HyperLogLog] = {}
    for r in parts.itertuples():
        h = HyperLogLog.restore(r.sketch)
        if r.event_type in merged:
            merged[r.event_type].merge(h)
        else:
            merged[r.event_type] = h
    types = sorted(merged)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "approx_users": pa.array(
                [int(round(merged[t].estimate())) for t in types], pa.int64()
            ),
        }
    )


def hash_sample(sf_dir: str, pct: int = 5):
    """Deterministic pct% sample of events: keep iff the first 8 md5 hex
    chars of event_id, mod 100, < pct. SQL mirror uses the same formula."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def keep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        mask = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < pct
                for i in ids
            ),
            dtype=bool,
            count=len(ids),
        )
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def bottomk_sample(sf_dir: str, k: int = 200):
    """Fixed-size uniform sample via bottom-k order statistics (Cohen &
    Kaplan, "Summarizing data using bottom-k sketches", PODC 2007): keep
    the k events with the smallest 60-bit md5 priority. Unlike Bernoulli
    `hash_sample`, output size is exactly k regardless of input size, and
    bottom-k sets are mergeable: each batch emits only its own k smallest
    rows, so the driver merges ≤ k × #batches rows — never the corpus.
    Deterministic and SQL-mirrored (ORDER BY priority LIMIT k)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        prio = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        t = t.append_column("prio", pa.array(prio, pa.int64()))
        order = np.lexsort((np.asarray(ids, dtype=np.int64), prio))[:k]
        return t.take(pa.array(np.sort(order)))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["prio", "event_id"], kind="mergesort").head(k)
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].to_numpy(), pa.int64()),
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "value": pa.array(out["value"].to_numpy(), pa.float64()),
            "prio": pa.array(out["prio"].to_numpy(), pa.int64()),
        }
    )


def weighted_sample(sf_dir: str, k: int = 200):
    """Weighted bottom-k sample (priority sampling, Cohen & Kaplan 2007):
    priority = hash / weight, keep the k smallest — inclusion probability
    grows with `value`, output size is exactly k, and partial bottom-k
    per batch keeps the merge at ≤ k × #batches rows. The priority uses
    only IEEE-exact ops (int64→double conversion and division — both
    correctly rounded and bit-identical in numpy and DuckDB; pow/ln are
    NOT, which is why this is priority- rather than Efraimidis–Spirakis
    exponential-key sampling)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        h = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        w = np.maximum(t["value"].to_numpy(zero_copy_only=False), 1e-6)
        prio = h.astype(np.float64) / w
        order = np.lexsort((np.asarray(ids, dtype=np.int64), prio))[:k]
        t = t.append_column("prio", pa.array(prio, pa.float64()))
        return t.take(pa.array(np.sort(order)))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["prio", "event_id"], kind="mergesort").head(k)
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].to_numpy(), pa.int64()),
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "value": pa.array(out["value"].to_numpy(), pa.float64()),
        }
    )


def grouped_sample(sf_dir: str, k: int = 50):
    """Per-stratum fixed-size sample: the k events with the smallest
    60-bit md5 priority WITHIN each event_type (bottom-k per group —
    Cohen & Kaplan 2007 applied per stratum). Unlike `stratified_sample`
    (Bernoulli per stratum, variable size) the output is exactly
    min(k, group size) rows per type. Distributed shape: each batch
    emits only its own bottom-k per group, so the driver merge holds
    ≤ k × #types × #batches rows — never the corpus. SQL mirror:
    row_number() OVER (PARTITION BY event_type ORDER BY prio, event_id)
    <= k."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df["event_id"].tolist()
        df["prio"] = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        df = df.sort_values(["prio", "event_id"], kind="mergesort")
        keep = df.groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(keep, preserve_index=False)

    # bounded merge: ≤ k × #types × #batches tiny partial rows
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["prio", "event_id"], kind="mergesort")
        .groupby("event_type", sort=False)
        .head(k)
        .sort_values(["event_type", "prio", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].to_numpy(np.int64), pa.int64()),
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "value": pa.array(out["value"].to_numpy(np.float64), pa.float64()),
            "prio": pa.array(out["prio"].to_numpy(np.int64), pa.int64()),
        }
    )


def regex_token_stats(sf_dir: str):
    """BPE-ish regex tokenization (words | single non-space punctuation):
    per-language token totals; DuckDB oracle uses regexp_extract_all with
    the same RE2-compatible pattern. Counting runs in Arrow's RE2 kernel
    (count_substring_regex — non-overlapping matches, same semantics as
    re.findall length; verified identical and 1.6× faster at sf0.1),
    so no text row ever surfaces to Python."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text", "lang"])
    pattern = r"[a-zA-Z0-9_]+|[^\sa-zA-Z0-9_]"

    def tok(t: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(t["text"], pattern)
        return pa.table(
            {"lang": t["lang"], "n_tok": pc.cast(counts, pa.int64())}
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(tok, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_tok", alias_name="sum_regex_tokens"))
    )


class QuantileSketch:
    """Mergeable quantile sketch — deterministic KLL-style compactor
    (Karnin/Lang/Liberty, FOCS 2016, with the fixed even-index
    compaction offset instead of the randomized one): level i holds at
    most k values each representing 2^i originals; an overfull level is
    sorted and its even-indexed half promoted. Deterministic ⇒ the same
    input partitioned ANY way merges to the same sketch ranks
    (reproducibility over unbiasedness — the right trade for a
    determinism-tested engine; error is tolerance-tested, ~O(n/k) rank
    error). This is the at-scale path for percentiles where the exact
    `quantiles` op's per-group sort is infeasible."""

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = np.sort(self.levels[i], kind="stable")
                promoted = buf[0::2]
                self.levels[i] = np.empty(0, np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def add_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, lv in enumerate(other.levels):
            if i == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        total = int(wts.sum())
        rank = max(1, int(np.ceil(q * total)))  # quantile_disc semantics
        idx = int(np.searchsorted(np.cumsum(wts), rank))
        return float(vals[min(idx, len(vals) - 1)])

    def dump(self) -> bytes:
        import struct as _struct

        out = [_struct.pack("<QQ", self.k, len(self.levels))]
        for lv in self.levels:
            out.append(_struct.pack("<Q", len(lv)))
            out.append(np.ascontiguousarray(lv).tobytes())
        return b"".join(out)

    @classmethod
    def restore(cls, data: bytes) -> "QuantileSketch":
        import struct as _struct

        k, nlev = _struct.unpack_from("<QQ", data, 0)
        obj = cls(int(k))
        obj.levels = []
        off = 16
        for _ in range(nlev):
            (n,) = _struct.unpack_from("<Q", data, off)
            off += 8
            obj.levels.append(
                np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
            )
            off += 8 * n
        return obj


def quantile_sketch(sf_dir: str, k: int = 256):
    """Approximate per-event-type value percentiles via mergeable
    QuantileSketch partials: one sketch per (batch × type) travels as
    bytes, a tiny driver pass merges (#batches × #types sketches — the
    HLL pattern). Rows-only correctness class (approximate by nature):
    rank-tolerance-tested against exact quantile_disc in pytest."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def sketch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "value": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        types, blobs = [], []
        for et, g in df.groupby("event_type"):
            s = QuantileSketch(k)
            s.add_batch(g["value"].to_numpy(dtype=np.float64))
            types.append(et)
            blobs.append(s.dump())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    merged: dict[str, QuantileSketch] = {}
    for r in parts.itertuples():
        s = QuantileSketch.restore(r.sketch)
        if r.event_type in merged:
            merged[r.event_type].merge(s)
        else:
            merged[r.event_type] = s
    types = sorted(merged)
    cols = {"event_type": pa.array(types, pa.string())}
    for q, name in ((0.5, "p50_e4"), (0.9, "p90_e4"), (0.99, "p99_e4")):
        cols[name] = pa.array(
            [int(np.floor(merged[t].quantile(q) * 10_000 + 0.5)) for t in types],
            pa.int64(),
        )
    return pa.table(cols)


def props_extract_agg(sf_dir: str):
    """Semi-structured ETL: extract the integer field from the JSON-ish
    `props` column with ONE vectorized Arrow regex kernel (zero-copy, no
    per-row json.loads) and aggregate per event type via per-batch
    partials — the scan never re-shuffles raw rows. Oracle mirrors the
    same RE2 pattern with DuckDB regexp_extract."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(pc.extract_regex(t["props"], r"(?P<k>[0-9]+)"), "k"),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "k": k.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), min_k=("k", "min"), max_k=("k", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def stratified_sample(sf_dir: str, pct: int = 10):
    """Deterministic per-stratum (event_type) sample: keep iff
    md5(event_type || ':' || event_id) mod 100 < pct — every stratum gets
    its own hash stream, so skewed strata sample at the same rate
    (partition-independent, SQL-mirrored)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def keep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        types = t["event_type"].to_pylist()
        mask = np.fromiter(
            (
                int(hashlib.md5(f"{et}:{i}".encode()).hexdigest()[:8], 16) % 100 < pct
                for et, i in zip(types, ids)
            ),
            dtype=bool,
            count=len(ids),
        )
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_sample_replace(sf_dir: str, k: int = 8):
    """Per-stratum sample WITH replacement: k independent draws per
    event_type, where draw j selects the event minimizing the
    deterministic priority md5(f"{event_id}:{j}") (first 15 hex digits as
    int64) — per-draw argmin over the stratum, so one row CAN win several
    draws (the with-replacement semantics `grouped_sample`'s bottom-k
    cannot express). Deterministic and partition-independent like the
    other hash samplers. Distributed shape: each batch emits only its own
    per-(type, draw) argmin row, so the driver merge holds
    ≤ #types × k × #batches tiny rows — never the corpus. SQL mirror:
    row_number() OVER (PARTITION BY event_type, draw ORDER BY prio,
    event_id) = 1 over an events × range(k) cross join."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    draws = np.arange(k, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df["event_id"].tolist()
        frames = []
        for j in draws:
            d = df.copy()
            d["draw"] = np.int64(j)
            d["prio"] = np.fromiter(
                (
                    int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15], 16)
                    for i in ids
                ),
                dtype=np.int64,
                count=len(ids),
            )
            frames.append(d)
        allp = pd.concat(frames, ignore_index=True)
        win = (
            allp.sort_values(["prio", "event_id"], kind="mergesort")
            .groupby(["event_type", "draw"], sort=False)
            .head(1)
        )
        return pa.Table.from_pandas(win, preserve_index=False)

    # bounded merge: ≤ #types × k × #batches tiny partial rows
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["prio", "event_id"], kind="mergesort")
        .groupby(["event_type", "draw"], sort=False)
        .head(1)
        .sort_values(["event_type", "draw"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "draw": pa.array(out["draw"].to_numpy(np.int64), pa.int64()),
            "event_id": pa.array(out["event_id"].to_numpy(np.int64), pa.int64()),
            "value": pa.array(out["value"].to_numpy(np.float64), pa.float64()),
        }
    )
