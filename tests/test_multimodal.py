"""Multimodal stub stage: real actor-pool plumbing, deterministic fake
decode, explicit NotImplementedError marker for real codecs."""

import os

import numpy as np
import pytest

import ray.data as rd

from cosmogony_ray.functions.multimodal import (
    FEATURE_DIM,
    MediaDecodeActor,
    extract_media_features,
)


def test_real_codec_stub_marker():
    with pytest.raises(NotImplementedError):
        MediaDecodeActor(require_real_codecs=True)


def test_fake_decode_deterministic():
    a = MediaDecodeActor()
    f1 = a._fake_decode(b"payload")
    f2 = a._fake_decode(b"payload")
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (FEATURE_DIM,)
    assert not np.array_equal(f1, a._fake_decode(b"other"))


def test_extract_media_features_pipeline(ray_session, mini_lux_dir):
    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    feats = extract_media_features(docs).to_pandas()
    # only media spans (kind != text) produce rows
    orig = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet")).to_pandas()
    n_media = sum(
        1 for spans in orig["spans"] for s in spans if dict(s)["media_ref"]
    )
    assert len(feats) == n_media > 0
    assert set(feats["kind"]) <= {"image", "audio"}
    assert all(len(f) == FEATURE_DIM for f in feats["feature"])
    # deterministic across runs
    again = extract_media_features(
        rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    ).to_pandas()
    a = feats.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_resize_media_pipeline(ray_session, mini_lux_dir):
    """Resize plumbing: one fixed-size RGB row per media span; the
    nearest-neighbor kernel is real (deterministic across runs and
    resolutions divide correctly)."""
    from cosmogony_ray.functions.multimodal import resize_media

    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    out = resize_media(docs, width=4, height=6).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"doc_id", "span_index", "width", "height", "pixels"}
    assert (out["width"] == 4).all() and (out["height"] == 6).all()
    assert all(len(p) == 4 * 6 * 3 for p in out["pixels"])
    out2 = resize_media(docs, width=4, height=6).to_pandas()
    a = out.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    assert all((x == y).all() for x, y in zip(a["pixels"], b["pixels"]))


def test_sample_frames_explode(ray_session, mini_lux_dir):
    """Frame sampling: one row per SAMPLED frame, frame indices are the
    stride grid of the deterministic per-payload frame count."""
    from cosmogony_ray.functions.multimodal import sample_frames

    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    out = sample_frames(docs, stride=3).to_pandas()
    assert len(out) > 0
    assert (out["frame_index"] % 3 == 0).all()
    # per span: indices are exactly 0,3,6,... up to its frame count
    for (_, _), g in out.groupby(["doc_id", "span_index"]):
        fi = sorted(g["frame_index"])
        assert fi == list(range(0, fi[-1] + 1, 3))
