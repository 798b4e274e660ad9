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
