"""Multimodal stage plumbing: real PNG decode, schema, chained stages."""

import numpy as np
import pyarrow as pa

from frontera_ray.functions.png import decode_png, encode_png
from frontera_ray.ops.multimodal import (
    FEATURE_DIM,
    FrameSampleStage,
    MediaFeatureStage,
    ResizeStage,
    decode_features,
    encode_media,
    media_image,
    media_pipeline,
)


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(7)
    for shape in [(16, 16), (8, 16), (13, 5), (1, 1), (16, 16, 3), (9, 7, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        h = shape[0]
        for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h,
                        [i % 5 for i in range(h)]):
            assert np.array_equal(decode_png(encode_png(img, filters)), img)


def test_real_decode_matches_analytic_rule():
    # the oracle's contract: decoding the encoded payload must reproduce
    # the analytic fixture image exactly, for ids exercising every filter
    for mid in range(12):
        img = media_image(mid)
        assert np.array_equal(decode_png(encode_media(mid)), img)
        feat, n_px = decode_features(encode_media(mid))
        assert n_px == img.size
        hist = np.bincount(img.reshape(-1) >> 4, minlength=FEATURE_DIM)
        assert np.allclose(feat, hist / img.size)


def _media_table(ids):
    payloads = [encode_media(i) for i in ids]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(
                [("image", "audio", "video")[i % 3] for i in ids], pa.string()
            ),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def test_stage_chain_shapes():
    t = _media_table([1, 2])
    feats = MediaFeatureStage()(t)
    assert feats["feature"].type == pa.list_(pa.float32(), FEATURE_DIM)
    assert feats["n_pixels"].to_pylist() == [16 * 9, 16 * 10]
    small = ResizeStage(out_dim=4)(feats)
    assert small["feature_small"].type == pa.list_(pa.float32(), 4)
    # re-binning preserves mass
    f0 = np.asarray(feats["feature"][0].as_py())
    s0 = np.asarray(small["feature_small"][0].as_py())
    assert abs(f0.sum() - s0.sum()) < 1e-5
    # frame sampling runs over the DECODED pixel stream: media 1 decodes
    # to 144 bytes → 3 chunks of 64 → stride 2 keeps idx 0, 2
    frames = FrameSampleStage(frame_bytes=64, stride=2)(t)
    by_id = frames.to_pandas().groupby("media_id")["frame_idx"].apply(list).to_dict()
    assert by_id == {1: [0, 2], 2: [0, 2]}
    flat = np.concatenate(
        [np.frombuffer(f, np.uint8) for f in frames["frame"].to_pylist()[:2]]
    )
    # kept frames are slices of the decoded image, not the encoded payload
    img1 = media_image(1).reshape(-1)
    assert np.array_equal(flat[:64], img1[:64])


def test_media_pipeline_runs(ray_session):
    out = media_pipeline("/root/testdata/sf0.001").to_pandas()
    assert {"media_id", "media_type", "n_pixels", "feat_small_e6", "n_frames"} <= set(
        out.columns
    )
    assert len(out) > 0
    assert (out["n_frames"] >= 1).all()
    # decoded pixel counts follow the analytic rule
    assert (
        out["n_pixels"] == 16 * (8 + out["media_id"] % 9)
    ).all()
