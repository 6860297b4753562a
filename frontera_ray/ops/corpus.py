"""The flagship training-data composite: a C4/Gopher-style corpus cleaning
pipeline (public recipes: quality filter → exact dedup → near-dup removal)
composed from the engine's own operators — each stage distributed, the
whole pipeline verified against ONE DuckDB oracle that re-expresses every
step (including the MinHash+LSH stage) in SQL.

Semantics (deterministic, non-cascading):
  1. quality gate: token count ≥ min_tokens
  2. exact dedup among survivors: winner = min(doc_id) per identical text
  3. near-dup removal: drop doc d if some surviving doc a < d forms a
     verified MinHash+LSH pair (est_jaccard ≥ 0.5) with it — the classic
     keep-first-representative rule, evaluated against the step-2 survivor
     set (non-cascading, so the result is order-independent).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from .dedup import minhash_lsh_pairs


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def clean_corpus(sf_dir: str, min_tokens: int = 50):
    """→ (doc_id, n_tokens) of the cleaned corpus. Every heavy step is a
    Dataset stage; the only driver-side data are the (tiny) near-dup pair
    list and the per-text winner table."""
    import ray

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def quality(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64()
        )
        keep = pc.greater_equal(n_tokens, min_tokens)
        sub = t.filter(keep)
        hs = [
            hashlib.md5(x.encode()).hexdigest() for x in sub["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "n_tokens": n_tokens.filter(keep),
                "h": pa.array(hs, pa.string()),
            }
        )

    # materialize once: the survivor table feeds BOTH the winner groupby
    # and the final filter (small: ids + hashes + counts, no text)
    gated = docs.map_batches(quality, batch_format="pyarrow").materialize()
    # exact dedup among survivors: ONE shuffle on the text hash
    winners = (
        gated.groupby("h").aggregate(Min("doc_id", alias_name="doc_id")).to_pandas()
    )
    win_ids = np.sort(winners["doc_id"].to_numpy(dtype=np.int64))
    # near-dup pairs over the full corpus (distributed LSH); drop d when a
    # surviving a < d pairs with it
    pairs = minhash_lsh_pairs(sf_dir, threshold=0.5).to_pandas()
    surv = set(win_ids.tolist())
    dropped = np.array(
        sorted(
            {
                int(b)
                for a, b in zip(pairs["doc_a"], pairs["doc_b"])
                if int(a) in surv and int(b) in surv
            }
        ),
        dtype=np.int64,
    )
    keep_ids = win_ids[~np.isin(win_ids, dropped)]
    keep_ref = ray.put(keep_ids)

    def final(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.drop_columns(["h"]).filter(
            pa.array(np.isin(ids, ray.get(keep_ref)))
        )

    return gated.map_batches(final, batch_format="pyarrow")
