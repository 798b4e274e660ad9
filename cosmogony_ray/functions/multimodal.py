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
