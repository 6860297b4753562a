"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample as actor-pool map_batches stages.

The actual codec libraries are NOT in this container, so the decode kernel
is a clearly-marked STUB (deterministic fake decode) behind the same
actor/batch/schema plumbing a real decoder would use — the Ray-side shape
(binary in, fixed-width features out, small batches, actor pool with
per-actor setup) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),      # opaque encoded bytes
        pa.field("media_type", pa.string()),   # image/audio/video
        pa.field("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 16


def fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic 16-bin byte histogram, normalized.

    A real build replaces this body with PIL/libav decode + model feature
    extraction; everything around it (schema, batching, actor pool) stays.
    """
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    return hist / max(1.0, hist.sum())


class MediaFeatureStage:
    """Actor-pool stage: heavy init (codec/model load — stubbed) happens
    ONCE per actor; __call__ decodes one small batch (binary payloads are
    wide — callers pass small batch_size so batch × concurrency fits the
    worker heap)."""

    def __init__(self):
        self.dim = FEATURE_DIM  # stand-in for model/codec handles

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [fake_decode(p) for p in t["payload"].to_pylist()]
        mat = np.stack(feats) if feats else np.zeros((0, FEATURE_DIM), np.float32)
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "n_bytes": t["n_bytes"],
                "feature": pa.array(list(mat), pa.list_(pa.float32(), FEATURE_DIM)),
                "feature_norm": pa.array(
                    np.round(np.linalg.norm(mat, axis=1), 6), pa.float64()
                ),
            }
        )


def documents_as_media(sf_dir: str):
    """Build a MEDIA_SCHEMA dataset from documents (text bytes standing in
    for encoded payloads — no media files exist in the sandbox)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "source"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [x.encode() for x in t["text"].to_pylist()]
        types = [
            ("image", "audio", "video")[int(d) % 3] for d in t["doc_id"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(types, pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def media_features(sf_dir: str):
    """The headline multimodal pipeline: binary payloads → actor-pool
    decode/feature stage (small batches for wide rows) → features table."""
    media = documents_as_media(sf_dir)
    feats = media.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=256,          # wide binary rows → small batches
        concurrency=2,           # actor pool
    )
    return feats.drop_columns(["feature"])  # fixed-width list stays Arrow-side; scalars for the check
