"""Multimodal stages: REAL pure-numpy BMP/PPM/WAV codecs, real pixel /
sample feature math, actor-pool plumbing over the fixture's interleaved
docs."""

import os

import numpy as np
import pytest

import ray.data as rd

from cosmogony_ray.functions.mediacodec import (
    audio_params,
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    gradient_audio,
    gradient_image,
    image_params,
    ref_seed,
    synth_media_payload,
)
from cosmogony_ray.functions.multimodal import (
    FEATURE_DIM,
    MediaDecodeActor,
    audio_features,
    extract_media_features,
    image_features,
)

# ------------------------------------------------------------------ codecs


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (7, 5), (16, 9)])
def test_bmp_roundtrip(w, h):
    """Round-trip incl. odd widths (exercises the 4-byte row padding)."""
    rng = np.random.RandomState(w * 100 + h)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(img)
    assert data[:2] == b"BM"
    np.testing.assert_array_equal(decode_bmp(data), img)


def test_bmp_top_down():
    """Negative height = top-down row order per the BMP spec."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp(img))
    # rewrite height (+2 → -2) and re-pack rows in top-down order
    import struct

    struct.pack_into("<i", data, 14 + 8, -2)
    stride = (3 * 3 + 3) & ~3
    rows = bytes(data[54:])
    data[54:] = rows[stride:] + rows[:stride]
    np.testing.assert_array_equal(decode_bmp(bytes(data)), img)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (16, 16)])
def test_ppm_roundtrip(w, h):
    rng = np.random.RandomState(w + h)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_comment_header():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = encode_ppm(img)
    with_comment = b"P6\n# a netpbm comment\n2 2\n255\n" + data.split(b"\n", 3)[3]
    np.testing.assert_array_equal(decode_ppm(with_comment), img)


def test_wav_roundtrip():
    rng = np.random.RandomState(7)
    samples = rng.randint(-32768, 32768, size=777, dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_decode_rejects_garbage():
    for fn in (decode_bmp, decode_ppm, decode_image):
        with pytest.raises(ValueError):
            fn(b"\x00\x01garbage-not-a-container")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


# --------------------------------------------------------------- synthesis


def test_synth_payload_is_real_container():
    """Payloads decode back to EXACTLY the closed-form gradient content —
    the contract the SQL oracle relies on."""
    for ref in [f"media://store/doc-{i:09d}/2.image" for i in range(40)]:
        seed = ref_seed(ref)
        w, h, base = image_params(seed)
        img = decode_image(synth_media_payload(ref))
        assert img.shape == (h, w, 3)
        np.testing.assert_array_equal(img, gradient_image(w, h, base))
    for ref in [f"media://store/doc-{i:09d}/1.audio" for i in range(40)]:
        n, mult = audio_params(ref_seed(ref))
        samples, rate = decode_wav(synth_media_payload(ref))
        assert rate == 8000
        np.testing.assert_array_equal(samples, gradient_audio(n, mult))


def test_synth_exercises_both_image_formats():
    payloads = [
        synth_media_payload(f"media://x/{i}.image") for i in range(50)
    ]
    magics = {p[:2] for p in payloads}
    assert magics == {b"BM", b"P6"}


# ---------------------------------------------------------------- features


def test_real_codecs_available():
    """The round-4 stub marker (require_real_codecs) is gone entirely:
    decode is always the real built-in pure-numpy path."""
    actor = MediaDecodeActor()
    assert "numpy-builtin" in actor.codecs
    import inspect

    assert "require_real_codecs" not in inspect.signature(
        MediaDecodeActor.__init__
    ).parameters


def test_image_features_from_known_pixels():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    f = image_features(img)
    assert f.shape == (FEATURE_DIM,)
    np.testing.assert_allclose(f[0:3], [1.0, 0.0, 0.0])  # channel means
    np.testing.assert_allclose(f[3:6], 0.0)  # channel stds
    assert f[6 + 5] == 1.0  # gray = 85 → bin 5 holds all pixels
    np.testing.assert_allclose(f[22], 85.0 / 255.0)  # gray mean
    assert f[29] == 0.0 and f[30] == 0.0  # flat image → no edges
    assert f[31] == 1.0


def test_audio_features_from_known_samples():
    samples = np.array([0, 16384, -16384, 16384], dtype=np.int16)
    f = audio_features(samples, 8000)
    np.testing.assert_allclose(f[0], 0.125)  # mean
    np.testing.assert_allclose(f[3], 0.5)  # max
    np.testing.assert_allclose(f[5], 2.0 / 3.0, rtol=1e-6)  # zero crossings
    np.testing.assert_allclose(f[23], 8000.0 / 48000.0)


# ---------------------------------------------------------------- pipeline


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
    # image features carry the modality marker; audio never does
    by_kind = feats.set_index(["doc_id", "span_index"])
    for _, row in by_kind.iterrows():
        assert (row["feature"][31] == 1.0) == (row["kind"] == "image")
    # deterministic across runs
    again = extract_media_features(
        rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    ).to_pandas()
    a = feats.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_resize_media_pipeline(ray_session, mini_lux_dir):
    """Resize plumbing: one fixed-size RGB row per IMAGE span (audio spans
    have no resize semantics and are filtered); the nearest-neighbor
    kernel runs over the real decode and is deterministic."""
    from cosmogony_ray.functions.multimodal import resize_media

    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    out = resize_media(docs, width=4, height=6).to_pandas()
    orig = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet")).to_pandas()
    n_images = sum(
        1 for spans in orig["spans"] for s in spans if dict(s)["kind"] == "image"
    )
    assert len(out) == n_images > 0
    assert set(out.columns) == {"doc_id", "span_index", "width", "height", "pixels"}
    assert (out["width"] == 4).all() and (out["height"] == 6).all()
    assert all(len(p) == 4 * 6 * 3 for p in out["pixels"])
    out2 = resize_media(docs, width=4, height=6).to_pandas()
    a = out.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "span_index"]).reset_index(drop=True)
    assert all((x == y).all() for x, y in zip(a["pixels"], b["pixels"]))


def test_resize_matches_direct_kernel(ray_session, mini_lux_dir):
    """The pipeline's pixels equal a direct decode+index-sample of the
    same ref — pins the whole fetch→decode→resize path."""
    from cosmogony_ray.functions.multimodal import resize_media

    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    out = resize_media(docs, width=4, height=4).to_pandas()
    orig = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet")).to_pandas()
    refs = {
        (row["doc_id"], i): dict(s)["media_ref"]
        for _, row in orig.iterrows()
        for i, s in enumerate(row["spans"])
        if dict(s)["kind"] == "image"
    }
    checked = 0
    for _, row in out.head(25).iterrows():
        img = decode_image(synth_media_payload(refs[(row["doc_id"], row["span_index"])]))
        sh, sw = img.shape[:2]
        yi = (np.arange(4) * sh // 4).astype(np.int64)
        xi = (np.arange(4) * sw // 4).astype(np.int64)
        np.testing.assert_array_equal(
            np.asarray(row["pixels"], dtype=np.uint8),
            img[np.ix_(yi, xi)].ravel(),
        )
        checked += 1
    assert checked > 0


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


def test_synth_payload_byte_goldens():
    """Byte-level goldens: any change to the codec or the synthesis closed
    form trips this loudly (the media_pixel_stats SQL oracle depends on
    these exact bytes)."""
    import hashlib

    for ref, md5hex, n in [
        ("media://doc/0.image", "8abb8055559ff480b2437556308d8fdb", 494),
        ("media://doc/1.image", "47d006a77be941a2def30ca3a9295cb3", 558),
        ("media://doc/2.audio", "8220fcc5f317ab3f4a1f79c919517022", 688),
        ("media://store/doc-000000007/3.image?lon=1.5,lat=2.5", "adb5e31f8a1a8fee2da2df322085a6ac", 276),
    ]:
        p = synth_media_payload(ref)
        assert (hashlib.md5(p).hexdigest(), len(p)) == (md5hex, n), ref
