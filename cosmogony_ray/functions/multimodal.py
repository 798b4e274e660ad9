"""Multimodal (image/audio/video) span processing — actor-pool stages.

The container ships no image/audio codecs (no PIL/ffmpeg), so the DECODE
step is stubbed exactly as the brief prescribes: a clearly-marked
``NotImplementedError`` behind ``require_real_codecs=True``, and a
deterministic fake decode otherwise. Everything around the stub — schema,
batch size, actor-pool signature, binary payload handling, output layout —
is real and tested, so swapping in a real codec is a one-function change.

Scale notes (ray_guide): media payloads are wide binary rows → small
``batch_size``; the actor pool amortizes codec init; features come back as
fixed-width ``list<float32>`` ready for the similarity operators."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

FEATURE_DIM = 32

MEDIA_FEATURE_T = pa.struct(
    [
        ("span_index", pa.int32()),
        ("kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


def fetch_media_bytes(ds: rd.Dataset, batch_size: int = 256) -> rd.Dataset:
    """Resolve each media span's ``media_ref`` to payload bytes.

    In production this stage reads object storage; here the payload is a
    deterministic fake derived from the ref (md5-seeded), so downstream
    plumbing processes realistic binary columns. Emits one row per media
    span: (doc_id, span_index, kind, media_ref, media_bytes)."""

    def fn(t: pa.Table) -> pa.Table:
        from ..functions.arrowtools import explode_list_column

        flat = explode_list_column(t, "spans", ["doc_id"], pos_col="span_index")
        mask = pc.invert(pc.equal(pc.fill_null(flat["media_ref"], ""), ""))
        flat = flat.filter(mask)
        refs = flat["media_ref"].to_pylist()
        payloads = []
        for r in refs:
            seed = hashlib.md5(r.encode()).digest()
            payloads.append(seed * 8)  # 128-byte deterministic fake payload
        return pa.table(
            {
                "doc_id": flat["doc_id"],
                "span_index": flat["span_index"],
                "kind": flat["kind"],
                "media_ref": flat["media_ref"],
                "media_bytes": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class MediaDecodeActor:
    """Actor-pool decode / feature-extract stage.

    ``__init__`` probes for real codecs once per actor (none in this
    container); ``__call__`` decodes per batch. With
    ``require_real_codecs=True`` the stage raises ``NotImplementedError`` —
    the explicit stub marker."""

    def __init__(self, require_real_codecs: bool = False):
        self.codecs = None
        try:  # pragma: no cover - codec probe (absent in this container)
            import PIL.Image  # noqa: F401

            self.codecs = "pil"
        except ImportError:
            self.codecs = None
        if require_real_codecs and self.codecs is None:
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this environment; run with require_real_codecs=False for "
                "the deterministic fake decode"
            )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic fake features: md5-chained floats in [0, 1)
        out = np.empty(FEATURE_DIM, dtype=np.float32)
        h = payload
        for i in range(0, FEATURE_DIM, 4):
            h = hashlib.md5(h).digest()
            for j in range(4):
                out[i + j] = int.from_bytes(h[4 * j : 4 * j + 4], "little") / 2**32
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["media_bytes"].to_pylist()
        feats = np.stack([self._fake_decode(p) for p in payloads]) if payloads else np.zeros((0, FEATURE_DIM), dtype=np.float32)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "span_index": t["span_index"],
                "kind": t["kind"],
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
                ),
            }
        )


def extract_media_features(
    docs: rd.Dataset, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """docs(doc_id, spans) → one feature row per media span."""
    media = fetch_media_bytes(docs, batch_size=batch_size)
    return media.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs={"require_real_codecs": False},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class MediaResizeActor:
    """Actor-pool image resize: decode (stubbed, see MediaDecodeActor) →
    REAL nearest-neighbor resize (pure-numpy index sampling — the resize
    kernel itself needs no codec) → fixed-size uint8 RGB buffer per span.
    Output layout: (doc_id, span_index, width, height,
    pixels: fixed_size_list<uint8>[W·H·3])."""

    SRC = 16  # fake-decode source resolution (SRC×SRC×3)

    def __init__(self, width: int, height: int, require_real_codecs: bool = False):
        self.width = width
        self.height = height
        self._probe = MediaDecodeActor(require_real_codecs=require_real_codecs)
        # nearest-neighbor index maps, computed once per actor
        self._xi = (np.arange(width) * self.SRC // width).astype(np.int64)
        self._yi = (np.arange(height) * self.SRC // height).astype(np.int64)

    def _fake_image(self, payload: bytes) -> np.ndarray:
        """Deterministic SRC×SRC×3 uint8 image from the payload bytes."""
        n = self.SRC * self.SRC * 3
        out = np.empty(n, dtype=np.uint8)
        h = payload
        for i in range(0, n, 16):
            h = hashlib.md5(h).digest()
            out[i : i + 16] = np.frombuffer(h, dtype=np.uint8)[: min(16, n - i)]
        return out.reshape(self.SRC, self.SRC, 3)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["media_bytes"].to_pylist()
        w, h = self.width, self.height
        if payloads:
            imgs = np.stack(
                [self._fake_image(p)[np.ix_(self._yi, self._xi)] for p in payloads]
            )
            flat = imgs.reshape(len(payloads), -1)
        else:
            flat = np.zeros((0, w * h * 3), dtype=np.uint8)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "span_index": t["span_index"],
                "width": pa.array(np.full(len(payloads), w, dtype=np.int32)),
                "height": pa.array(np.full(len(payloads), h, dtype=np.int32)),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.ravel(), type=pa.uint8()), w * h * 3
                ),
            }
        )


def resize_media(
    docs: rd.Dataset, *, width: int = 8, height: int = 8,
    concurrency=(1, 8), batch_size: int = 128,
) -> rd.Dataset:
    """docs(doc_id, spans) → one resized-RGB row per media span (actor
    pool; smaller default batch than features — pixel buffers are wide)."""
    media = fetch_media_bytes(docs, batch_size=batch_size)
    return media.map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampleActor:
    """Actor-pool video frame sampling: the (stub) decode derives a
    deterministic frame count from the payload (``len % 13 + 2`` fake
    frames), then every ``stride``-th frame is kept and feature-extracted —
    the EXPLODE plumbing (one input span → k output frame rows, offsets
    rebuilt vectorized) is the real contract a video pipeline needs.
    Output: (doc_id, span_index, frame_index, feature)."""

    def __init__(self, stride: int = 2, require_real_codecs: bool = False):
        self.stride = stride
        self._dec = MediaDecodeActor(require_real_codecs=require_real_codecs)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["media_bytes"].to_pylist()
        out_row, out_frame, out_feat = [], [], []
        for i, p in enumerate(payloads):
            n_frames = len(p) % 13 + 2
            for k in range(0, n_frames, self.stride):
                out_row.append(i)
                out_frame.append(k)
                out_feat.append(self._dec._fake_decode(p + k.to_bytes(4, "little")))
        feats = (
            np.stack(out_feat) if out_feat else np.zeros((0, FEATURE_DIM), np.float32)
        )
        take = pa.array(out_row, type=pa.int64())
        return pa.table(
            {
                # take preserves the input id/index types (doc_id may be
                # string or int depending on the corpus)
                "doc_id": t["doc_id"].take(take),
                "span_index": t["span_index"].take(take),
                "frame_index": pa.array(out_frame, type=pa.int32()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
                ),
            }
        )


def sample_frames(
    docs: rd.Dataset, *, stride: int = 2, concurrency=(1, 8), batch_size: int = 128
) -> rd.Dataset:
    """docs(doc_id, spans) → sampled frame-feature rows per media span."""
    media = fetch_media_bytes(docs, batch_size=batch_size)
    return media.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
