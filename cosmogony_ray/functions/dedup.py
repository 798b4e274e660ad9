"""Deduplication operators (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine) — first-class engine components for training-data
pipelines.

Scale shapes (ray_guide "Exact dedup" / MinHash-LSH recipe):
- exact: content-hash column (vectorized) → ``groupby(hash)`` shuffle →
  per-group min(doc_id) keeper;
- near-dup: per-batch signatures → explode to (band, band_hash, doc_id) →
  ``groupby(band key)`` → candidate pairs → verify (true Jaccard / hamming)
  → dedup pairs.
All randomness is seeded (fixed hash mixers), so outputs are deterministic
and retry-safe."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _norm(texts: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(texts)), r"\s+", " "
    )


def exact_dedup(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """→ (text_hash, keep_doc_id, n_dups): one row per distinct normalized
    content, keeper = min doc_id."""

    def add_hash(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode()).hexdigest() for s in _norm(t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]).to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "text_hash": pa.array(fps)})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # partition-wise vectorized: sort by (hash, doc_id), run-length reduce
    from .shuffle import PART_COL, add_partition_column

    parted = hashed.map_batches(
        lambda t: add_partition_column(t, ["text_hash"], 32), batch_format="pyarrow"
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("text_hash", sort=True)
            .agg(keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index()
        )
        out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
        out["n_dups"] = out["n_dups"].astype("int64")
        return out[["text_hash", "keep_doc_id", "n_dups"]]

    return parted.groupby(PART_COL).map_groups(per_partition, batch_format="pandas")


# ------------------------------------------------------------------ minhash

_MERSENNE = (1 << 61) - 1


def _token_arrays(texts: list[str], n: int = 3) -> list[np.ndarray]:
    """Word n-gram (shingle) hash sets per doc, u64 numpy arrays."""
    out = []
    for s in texts:
        toks = [t for t in (s or "").lower().split() if t]
        if len(toks) < n:
            sh = [" ".join(toks)] if toks else []
        else:
            sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        hs = np.array(
            sorted({int(hashlib.md5(x.encode()).hexdigest()[:15], 16) for x in sh}),
            dtype=np.uint64,
        )
        out.append(hs)
    return out


def _minhash_sig(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perms,) signature via universal hashing ((a*x+b) mod p)."""
    if shingles.size == 0:
        return np.zeros(a.shape[0], dtype=np.uint64)
    x = shingles[None, :].astype(np.object_)  # python ints avoid u64 overflow
    vals = (a[:, None] * x + b[:, None]) % _MERSENNE
    return np.array([int(v.min()) for v in vals], dtype=np.uint64)


def _perm_params(num_perms: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perms, dtype=np.int64).astype(object)
    b = rng.randint(0, _MERSENNE, size=num_perms, dtype=np.int64).astype(object)
    return a, b


def _verify_pairs_jaccard(
    cands: rd.Dataset, shingle_map_ref, threshold_pct: int
) -> rd.Dataset:
    import ray

    def verify(t: pa.Table) -> pa.Table:
        from .broadcast import get_cached

        m = get_cached(shingle_map_ref)
        keep = []
        da = t["doc_a"].to_pylist()
        db = t["doc_b"].to_pylist()
        for a_, b_ in zip(da, db):
            sa, sb = m.get(a_), m.get(b_)
            if sa is None or sb is None or sa.size == 0 or sb.size == 0:
                keep.append(False)
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            keep.append(100 * inter >= threshold_pct * union)
        return t.filter(pa.array(keep))

    return cands.map_batches(verify, batch_format="pyarrow")


def _dedup_pair_ds(pairs: rd.Dataset) -> rd.Dataset:
    from .shuffle import distinct_rows

    return distinct_rows(pairs, ["doc_a", "doc_b"])


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    num_perms: int = 64,
    bands: int = 16,
    threshold_pct: int = 50,
) -> rd.Dataset:
    """Near-duplicate pairs via MinHash-LSH (shingle → minhash → banded
    groupby buckets → verified true Jaccard ≥ threshold_pct/100).
    → (doc_a, doc_b), doc_a < doc_b.

    Note: verification uses a broadcast doc→shingles map (documents side of
    the comparison is re-hashed once; fine at correctness scale — the scale
    path recomputes shingles inside the verify stage from a pair-joined text
    column instead of broadcasting)."""
    import ray

    a, b = _perm_params(num_perms)
    rows = num_perms // bands

    shingle_map: dict[int, np.ndarray] = {}
    sig_ds = ds.map_batches(
        _SigFn(a, b, num_perms, bands, rows, text_col),
        batch_format="pyarrow",
    )
    # shingle map for the verify stage (broadcast small side)
    for t in ds.select_columns(["doc_id", text_col]).iter_batches(
        batch_size=2048, batch_format="pyarrow"
    ):
        ids = t["doc_id"].to_pylist()
        shs = _token_arrays(t[text_col].to_pylist())
        for i, s in zip(ids, shs):
            shingle_map[i] = s
    ref = ray.put(shingle_map)

    def cand(key: tuple, group: pa.Table) -> pa.Table | None:
        ids = sorted(group["doc_id"].to_pylist())
        if len(ids) < 2:
            return None
        da, db = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                da.append(ids[i])
                db.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(da, type=pa.int64()), "doc_b": pa.array(db, type=pa.int64())},
            schema=_PAIR_SCHEMA,
        )

    from .shuffle import grouped_map

    cands = grouped_map(
        sig_ds, ["band", "band_hash"], cand, empty_schema=_PAIR_SCHEMA
    )
    verified = _verify_pairs_jaccard(_dedup_pair_ds(cands), ref, threshold_pct)
    return verified


class _SigFn:
    """Banded minhash signature rows per doc: (band, band_hash, doc_id)."""

    def __init__(self, a, b, num_perms, bands, rows, text_col):
        self.a, self.b = a, b
        self.num_perms, self.bands, self.rows = num_perms, bands, rows
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        shingles = _token_arrays(t[self.text_col].to_pylist())
        band_col, hash_col, id_col = [], [], []
        for d, sh in zip(ids, shingles):
            sig = _minhash_sig(sh, self.a, self.b)
            for bi in range(self.bands):
                seg = sig[bi * self.rows : (bi + 1) * self.rows]
                h = hashlib.md5(seg.tobytes() + bytes([bi])).hexdigest()[:16]
                band_col.append(bi)
                hash_col.append(h)
                id_col.append(d)
        return pa.table(
            {
                "band": pa.array(band_col, type=pa.int32()),
                "band_hash": pa.array(hash_col, type=pa.string()),
                "doc_id": pa.array(id_col, type=pa.int64()),
            }
        )


# ------------------------------------------------------------------ simhash


def simhash_pairs(
    ds: rd.Dataset, text_col: str = "text", max_hamming: int = 3
) -> rd.Dataset:
    """SimHash near-dup pairs: 64-bit simhash over token hashes; blocking on
    4 16-bit bands (any pair within hamming ≤ 3 shares ≥ 1 exact band);
    verified by true hamming distance. → (doc_a, doc_b, hamming)."""

    def sig(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out_band, out_key, out_id, out_sig = [], [], [], []
        for d, s in zip(ids, t[text_col].to_pylist()):
            toks = [x for x in (s or "").lower().split() if x]
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in toks:
                h = np.uint64(int(hashlib.md5(tok.encode()).hexdigest()[:16], 16))
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            sh = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            for bi in range(4):
                out_band.append(bi)
                out_key.append((sh >> (16 * bi)) & 0xFFFF)
                out_id.append(d)
                out_sig.append(sh)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "key": pa.array(out_key, type=pa.int64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "sig": pa.array(np.array(out_sig, dtype=np.uint64).astype(np.int64)),
            }
        )

    sigs = ds.map_batches(sig, batch_format="pyarrow")

    _SIM_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int32())]
    )

    def cand(key_: tuple, group: pa.Table) -> pa.Table | None:
        rows = sorted(zip(group["doc_id"].to_pylist(), group["sig"].to_pylist()))
        da, db, hm = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                h = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                if h <= max_hamming:
                    da.append(rows[i][0])
                    db.append(rows[j][0])
                    hm.append(h)
        if not da:
            return None
        return pa.table(
            {
                "doc_a": pa.array(da, type=pa.int64()),
                "doc_b": pa.array(db, type=pa.int64()),
                "hamming": pa.array(hm, type=pa.int32()),
            },
            schema=_SIM_SCHEMA,
        )

    from .shuffle import distinct_rows, grouped_map

    cands = grouped_map(sigs, ["band", "key"], cand, empty_schema=_SIM_SCHEMA)
    return distinct_rows(cands, ["doc_a", "doc_b"])


# ------------------------------------------------------ embedding near-dup


def embedding_dup_pairs(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_col: str | None = "label",
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs (cos ≥ threshold), bucketed by
    ``bucket_col`` (hash/IVF bucket at scale; here the given column) —
    per-bucket brute-force cosine in one numpy matmul per group.
    → (id_a, id_b)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(g[vec_col].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        cos = mn @ mn.T
        ia, ib = np.nonzero(np.triu(cos >= threshold, k=1))
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    if bucket_col is None:
        raise NotImplementedError("global brute-force requires a bucket column")
    return ds.groupby(bucket_col).map_groups(per_bucket, batch_format="pandas")
