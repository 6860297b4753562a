"""Multimodal stage plumbing: schema, determinism, chained stages."""

import numpy as np
import pyarrow as pa

from frontera_ray.ops.multimodal import (
    FEATURE_DIM,
    FrameSampleStage,
    MediaFeatureStage,
    ResizeStage,
    fake_decode,
    media_pipeline,
)


def test_fake_decode_deterministic():
    a = fake_decode(b"hello world payload")
    b = fake_decode(b"hello world payload")
    assert np.array_equal(a, b)
    assert a.shape == (FEATURE_DIM,)
    assert abs(a.sum() - 1.0) < 1e-6
    assert np.array_equal(fake_decode(b""), np.zeros(FEATURE_DIM, np.float32))


def test_stage_chain_shapes():
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"x" * 300, b"y" * 10], pa.binary()),
            "media_type": pa.array(["video", "image"], pa.string()),
            "n_bytes": pa.array([300, 10], pa.int64()),
        }
    )
    feats = MediaFeatureStage()(t)
    assert feats["feature"].type == pa.list_(pa.float32(), FEATURE_DIM)
    small = ResizeStage(out_dim=4)(feats)
    assert small["feature_small"].type == pa.list_(pa.float32(), 4)
    # re-binning preserves mass
    f0 = np.asarray(feats["feature"][0].as_py())
    s0 = np.asarray(small["feature_small"][0].as_py())
    assert abs(f0.sum() - s0.sum()) < 1e-5
    frames = FrameSampleStage(frame_bytes=64, stride=2)(t)
    # 300 bytes → 5 frames → stride 2 keeps idx 0,2,4 ; 10 bytes → 1 frame
    by_id = frames.to_pandas().groupby("media_id")["frame_idx"].apply(list).to_dict()
    assert by_id == {1: [0, 2, 4], 2: [0]}


def test_media_pipeline_runs(ray_session):
    out = media_pipeline("/root/testdata/sf0.001").to_pandas()
    assert {"media_id", "media_type", "n_bytes", "feat_small_e6", "n_frames"} <= set(
        out.columns
    )
    assert len(out) > 0
    assert (out["n_frames"] >= 1).all()
