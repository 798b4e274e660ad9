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
import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

_log = logging.getLogger(__name__)

# LSH skew guard: a (band, band_hash) bucket larger than this emits only
# star pairs (min-doc_id representative × member) instead of all n(n-1)/2
# pairs. On a boilerplate-heavy corpus one hot bucket can hold 10^5-10^6
# members; the quadratic emitter would try ~5*10^11 pairs from ONE group.
# Star pairs keep every member connected to the bucket's min-doc_id
# representative at n-1 pairs per bucket. NOTE this is approximate, not
# lossless: when a downstream verify stage (true-Jaccard threshold) drops a
# star pair, that member loses all connectivity from this bucket even if it
# is a true near-dup of some OTHER member — recall can drop for capped
# buckets. Acceptable because capping only triggers on boilerplate mega-
# buckets where members are near-identical anyway. Overridable via env.
LSH_MAX_BUCKET = int(os.environ.get("COSMOGONY_LSH_MAX_BUCKET", "256"))

_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu_idx(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached upper-triangle index pair for group size n (n ≤ cap)."""
    got = _TRIU_CACHE.get(n)
    if got is None:
        got = np.triu_indices(n, k=1)
        _TRIU_CACHE[n] = (got[0].astype(np.int64), got[1].astype(np.int64))
        got = _TRIU_CACHE[n]
    return got


def _group_bounds(t: pa.Table, keys: list[str]) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Sort by keys (+ doc_id last key caller-included) and return
    (sorted_table, group_starts, group_ends) — one vectorized boundary scan,
    no per-key Python call."""
    t = t.sort_by([(k, "ascending") for k in keys])
    n = t.num_rows
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys[:-1] if keys[-1] == "doc_id" else keys:
        arr = t[k].to_numpy(zero_copy_only=False)
        change[1:] |= arr[1:] != arr[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    return t, starts, ends


def _norm(texts: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(texts)), r"\s+", " "
    )


def _md5_hex_batch(arr: pa.Array) -> list[str]:
    """md5 hex per string WITHOUT materializing Python strs: slice the
    Arrow values buffer by offsets (memoryview, zero-copy) and hash bytes
    directly. md5-of-document is inherently per-row; this removes the
    to_pylist + str.encode round trip (~2× on sf0.1 docs).

    Null slots would silently hash as md5(b"") (their offsets are equal),
    making null-text docs fingerprint identically to empty-text docs —
    diverging from SQL md5(NULL)=NULL. Reject them loudly instead; callers
    must filter nulls (the documents schema is non-null by construction)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError(
            f"_md5_hex_batch: {arr.null_count} null strings; md5(NULL) is NULL "
            "in SQL — filter nulls before fingerprinting"
        )
    if len(arr) == 0:
        return []
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = arr.buffers()[2]
    data = memoryview(buf) if buf is not None else memoryview(b"")
    md5 = hashlib.md5
    return [md5(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(arr))]


def exact_dedup(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """→ (text_hash, keep_doc_id, n_dups): one row per distinct normalized
    content, keeper = min doc_id."""

    def add_hash(t: pa.Table) -> pa.Table:
        fps = _md5_hex_batch(_norm(t[text_col]))
        return pa.table({"doc_id": t["doc_id"], "text_hash": pa.array(fps)})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # partition-wise vectorized: sort by (hash, doc_id), run-length reduce
    from .shuffle import PART_COL, add_partition_column, default_num_partitions

    nparts = default_num_partitions()
    parted = hashed.map_batches(
        lambda t: add_partition_column(t, ["text_hash"], nparts), batch_format="pyarrow"
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

_SHINGLE_MASK = np.uint64((1 << 61) - 1)


def _poly_consts(n: int, seed: int = 7) -> np.ndarray:
    """n fixed odd u64 mixing constants (deterministic across batches)."""
    rng = np.random.RandomState(seed)
    c = rng.randint(0, 1 << 62, size=n, dtype=np.int64).astype(np.uint64)
    return c | np.uint64(1)


def _token_hash_positions(
    texts, hex_chars: int = 15
) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-native whitespace tokenizer → (counts, th): per-doc token
    counts and one u64 hash per token POSITION (duplicates kept, doc order
    preserved). md5 is paid once per UNIQUE token in the batch (dictionary
    vocab); ``hex_chars`` md5 hex digits become the u64 (15 for the minhash
    shingle path, 16 for simhash — kept distinct so round-3 outputs are
    bit-identical). Shared front half of minhash shingling and simhash."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, type=pa.string()
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ndocs = len(arr)
    if ndocs == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    splits = pc.utf8_split_whitespace(pc.utf8_lower(arr))
    lens = pc.fill_null(pc.list_value_length(splits), 0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(splits)
    keep = pc.not_equal(flat, "")                   # split emits empties at edges
    kmask = keep.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)[kmask]
    counts = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
    if int(counts.sum()) == 0:
        return counts, np.zeros(0, dtype=np.uint64)
    dic = flat.filter(keep).dictionary_encode()
    uniq = dic.dictionary.to_pylist()
    uh = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:hex_chars], 16) for u in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    th = uh[dic.indices.to_numpy(zero_copy_only=False)]  # u64 hash per token position
    return counts, th


def _token_arrays(texts: list[str], n: int = 3) -> list[np.ndarray]:
    """Word n-gram (shingle) hash sets per doc — sorted-unique u64 arrays.

    Vectorized (round-3 rework of the per-shingle md5 loop): md5 is paid
    once per UNIQUE token in the batch (vocab), then every n-gram hash is
    a polynomial mix of the token hashes computed as one sliding-window
    u64 pass over the flattened token-hash array (wraparound multiply-add,
    masked to 61 bits). Micro-bench on sf0.1 docs (4k docs/batch): the
    whole signature stage (_SigFn) went 14.3 s → 0.10 s (~140×);
    tokenisation is Arrow-native (utf8_split_whitespace + dictionary
    vocab), the n-gram hashing a single vector pass."""
    counts, th = _token_hash_positions(texts)
    ndocs = counts.size
    empty = np.array([], dtype=np.uint64)
    if ndocs == 0:
        return []
    total = int(counts.sum())
    if total == 0:
        return [empty for _ in range(ndocs)]
    offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    C = _poly_consts(n)
    acc = None
    if total >= n:
        acc = C[0] * th[: total - n + 1]
        for k in range(1, n):
            acc = acc + C[k] * th[k : k + total - n + 1]   # u64 wraparound
        acc = acc & _SHINGLE_MASK
    out = []
    for i in range(ndocs):
        lo, hi = int(offs[i]), int(offs[i + 1])
        m = hi - lo
        if m == 0:
            out.append(empty)
        elif m < n:
            val = (C[:m] * th[lo:hi]).sum(dtype=np.uint64)  # whole short doc = 1 shingle
            out.append(np.array([val & _SHINGLE_MASK], dtype=np.uint64))
        else:
            out.append(np.unique(acc[lo : hi - n + 1]))
    return out


def _minhash_sigs_batch(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perms) signatures — per permutation p the hash is the
    u64 bijection x ↦ (x + b[p])·a[p] mod 2^64 (a odd ⇒ a true permutation
    of the key space, which is exactly what minhash wants), evaluated as
    one fused vector op + segmented ``minimum.reduceat`` per permutation.
    Replaces the round-2 (perms × shingles) Mersenne matrix whose six u64
    temporaries dominated the stage (13.8 s → 0.05 s per 4k-doc batch on
    sf0.1)."""
    num_perms = a.shape[0]
    if not shingle_arrays:
        return np.zeros((0, num_perms), dtype=np.uint64)
    counts = np.fromiter((x.size for x in shingle_arrays), dtype=np.int64)
    nonempty = [x for x in shingle_arrays if x.size]
    if not nonempty:
        return np.zeros((len(shingle_arrays), num_perms), dtype=np.uint64)
    flat = np.concatenate(nonempty)
    ne_counts = counts[counts > 0]
    segs = np.concatenate([[0], np.cumsum(ne_counts)[:-1]])
    mins = np.empty((len(nonempty), num_perms), dtype=np.uint64)
    for p in range(num_perms):
        hp = (flat + b[p]) * a[p]                       # u64 wraparound bijection
        mins[:, p] = np.minimum.reduceat(hp, segs)
    out = np.zeros((len(shingle_arrays), num_perms), dtype=np.uint64)
    out[counts > 0] = mins
    return out


def _perm_params(num_perms: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=num_perms, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perms, dtype=np.int64).astype(np.uint64)
    return a, b


def _verify_joined_pairs(t: pa.Table, threshold_pct: int) -> pa.Table:
    """True n-gram Jaccard over the pair-joined text columns — shingles are
    recomputed INSIDE the verify stage (streams; no whole-corpus driver
    materialization)."""
    sa_list = _token_arrays(t["text_a"])
    sb_list = _token_arrays(t["text_b"])
    keep = np.zeros(t.num_rows, dtype=bool)
    for i, (sa, sb) in enumerate(zip(sa_list, sb_list)):
        if sa.size == 0 or sb.size == 0:
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        keep[i] = 100 * inter >= threshold_pct * union
    return t.filter(pa.array(keep))


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

    Scale shape end-to-end: banded-LSH blocking (bucket size CAPPED at
    ``LSH_MAX_BUCKET`` — star pairs above the cap, the standard LSH skew
    guard), pair dedup, then the verify stage joins candidate pairs back to
    the text column (two hash joins) and re-tokenizes INSIDE the stage —
    nothing corpus-sized is ever collected on the driver.

    Precondition: ``doc_id`` values are UNIQUE in ``ds`` (the documents
    contract). The text-attach joins declare it (``right_unique=True``) so
    a corrupted corpus with a repeated doc_id fails LOUDLY here rather
    than silently double-counting pairs downstream."""
    from .joins import hash_join
    from .shuffle import partitioned_map

    a, b = _perm_params(num_perms)
    rows = num_perms // bands

    sig_ds = ds.map_batches(
        _SigFn(a, b, num_perms, bands, rows, text_col),
        batch_format="pyarrow",
    )

    def cand_partition(part: pa.Table) -> pa.Table | None:
        """All candidate pairs of one hash partition in one vectorized pass:
        sort by (band, band_hash, doc_id), boundary-scan the groups, emit
        cached-triu pairs per small group and star pairs (min-doc_id rep ×
        member) for groups above LSH_MAX_BUCKET."""
        if part.num_rows == 0:
            return None
        part, starts, ends = _group_bounds(part, ["band", "band_hash", "doc_id"])
        ids = part["doc_id"].to_numpy(zero_copy_only=False)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        capped = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > LSH_MAX_BUCKET:
                capped += 1
                out_a.append(np.full(m - 1, ids[s], dtype=np.int64))
                out_b.append(ids[s + 1 : e])
            else:
                ia, jb = _triu_idx(m)
                out_a.append(ids[s + ia])
                out_b.append(ids[s + jb])
        if capped:
            _log.warning(
                "minhash_lsh_pairs: %d bucket(s) over LSH_MAX_BUCKET=%d capped "
                "to star pairs in this partition",
                capped,
                LSH_MAX_BUCKET,
            )
        if not out_a:
            return None
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            },
            schema=_PAIR_SCHEMA,
        )

    cands = partitioned_map(
        sig_ds, ["band", "band_hash"], cand_partition, empty_schema=_PAIR_SCHEMA
    )
    pairs = _dedup_pair_ds(cands)
    docs_a = ds.map_batches(
        lambda t: pa.table({"doc_a": t["doc_id"], "text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    docs_b = ds.map_batches(
        lambda t: pa.table({"doc_b": t["doc_id"], "text_b": t[text_col]}),
        batch_format="pyarrow",
    )
    j1 = hash_join(
        pairs,
        docs_a,
        "doc_a",
        right_unique=True,  # one text row per doc id
        left_schema=_PAIR_SCHEMA,
        right_schema=pa.schema([("doc_a", pa.int64()), ("text_a", pa.string())]),
    )
    j2 = hash_join(
        j1,
        docs_b,
        "doc_b",
        right_unique=True,  # one text row per doc id
        left_schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("text_a", pa.string())]
        ),
        right_schema=pa.schema([("doc_b", pa.int64()), ("text_b", pa.string())]),
    )
    verified = j2.map_batches(
        lambda t: _verify_joined_pairs(t, threshold_pct), batch_format="pyarrow"
    )
    return verified.select_columns(["doc_a", "doc_b"])


class _SigFn:
    """Banded minhash signature rows per doc: (band, band_hash, doc_id)."""

    def __init__(self, a, b, num_perms, bands, rows, text_col):
        self.a, self.b = a, b
        self.num_perms, self.bands, self.rows = num_perms, bands, rows
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        shingles = _token_arrays(t[self.text_col])
        sigs = _minhash_sigs_batch(shingles, self.a, self.b)  # (n, perms)
        n = sigs.shape[0]
        # vectorized band hash: polynomial mix of the band's rows + a band
        # salt (replaces the per-doc-per-band md5 loop of round 2)
        bv = sigs.reshape(n, self.bands, self.rows)
        D = _poly_consts(self.rows + 1, seed=11)
        bh = bv[:, :, 0] * D[1]
        for k in range(1, self.rows):
            bh = bh + bv[:, :, k] * D[k + 1]            # u64 wraparound
        bh = bh + D[0] * np.arange(self.bands, dtype=np.uint64)[None, :]
        bh ^= bh >> np.uint64(31)                        # finalizer mix
        bh = bh * np.uint64(0x94D049BB133111EB)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), type=pa.int32()
                ),
                "band_hash": pa.array(bh.reshape(-1), type=pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
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
        n = t.num_rows
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        # Arrow-native tokenizer shared with minhash (round-4: replaces the
        # per-doc Python split loop, ~1 ms/doc); md5 once per UNIQUE token
        # (16 hex chars → full 64 bits, matching the round-3 outputs). The
        # ±1 bit accumulation is one reduceat over the flat token-bit matrix.
        counts, th = _token_hash_positions(t[text_col], hex_chars=16)
        shifts = np.arange(64, dtype=np.uint64)
        acc = np.zeros((n, 64), dtype=np.int64)
        nonzero = counts > 0
        if th.size:
            # hash once per unique u64 in the batch, expand via inverse map
            uh, inv = np.unique(th, return_inverse=True)
            vb = (
                ((uh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                * 2
                - 1
            )
            contrib = vb[inv]  # (flat, 64) of ±1
            # reduceat start offsets for the NON-EMPTY docs only (a
            # zero-length segment would re-read the next doc's first row)
            ne_counts = counts[nonzero]
            segs = np.concatenate([[0], np.cumsum(ne_counts)[:-1]]).astype(np.int64)
            acc[nonzero] = np.add.reduceat(contrib, segs, axis=0)
        sig64 = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        # vectorized band explode: 4 × 16-bit keys per doc
        bands4 = np.arange(4, dtype=np.uint64)
        keys = (sig64[:, None] >> (bands4[None, :] * np.uint64(16))) & np.uint64(
            0xFFFF
        )
        return pa.table(
            {
                "band": pa.array(
                    np.tile(bands4.astype(np.int32), n), type=pa.int32()
                ),
                "key": pa.array(keys.reshape(-1).astype(np.int64), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, 4), type=pa.int64()),
                "sig": pa.array(np.repeat(sig64.astype(np.int64), 4)),
            }
        )

    sigs = ds.map_batches(sig, batch_format="pyarrow")

    _SIM_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int32())]
    )

    def _popcount64(x: np.ndarray) -> np.ndarray:
        """Vectorized popcount of a uint64 array (any shape): view each u64
        as 8 bytes, unpack bits, sum."""
        b = np.unpackbits(x.reshape(x.shape + (1,)).view(np.uint8), axis=-1)
        return b.sum(axis=-1, dtype=np.int64)

    def cand_partition(part: pa.Table) -> pa.Table | None:
        """Per-partition vectorized candidate pass with the same skew guard
        as minhash: groups over LSH_MAX_BUCKET verify members against the
        min-doc_id representative only (star), small groups via a full
        pairwise XOR-popcount matrix."""
        if part.num_rows == 0:
            return None
        part, starts, ends = _group_bounds(part, ["band", "key", "doc_id"])
        ids = part["doc_id"].to_numpy(zero_copy_only=False)
        sig_arr = part["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        capped = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            gid = ids[s:e]
            gsig = sig_arr[s:e]
            if m > LSH_MAX_BUCKET:
                capped += 1
                hm = _popcount64(gsig[1:] ^ gsig[0])
                keep = (hm <= max_hamming) & (gid[1:] != gid[0])
                out_a.append(np.full(int(keep.sum()), gid[0], dtype=np.int64))
                out_b.append(gid[1:][keep])
                out_h.append(hm[keep].astype(np.int32))
            else:
                ia, jb = _triu_idx(m)
                hm = _popcount64(gsig[ia] ^ gsig[jb])
                keep = (hm <= max_hamming) & (gid[ia] != gid[jb])
                out_a.append(gid[ia][keep])
                out_b.append(gid[jb][keep])
                out_h.append(hm[keep].astype(np.int32))
        if capped:
            _log.warning(
                "simhash_pairs: %d bucket(s) over LSH_MAX_BUCKET=%d capped to "
                "star verification in this partition",
                capped,
                LSH_MAX_BUCKET,
            )
        if not out_a:
            return None
        da = np.concatenate(out_a)
        if da.size == 0:
            return None
        return pa.table(
            {
                "doc_a": pa.array(da, type=pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "hamming": pa.array(np.concatenate(out_h), type=pa.int32()),
            },
            schema=_SIM_SCHEMA,
        )

    from .shuffle import distinct_rows, partitioned_map

    cands = partitioned_map(sigs, ["band", "key"], cand_partition, empty_schema=_SIM_SCHEMA)
    return distinct_rows(cands, ["doc_a", "doc_b"])


# ------------------------------------------------------ embedding near-dup


def embedding_dup_pairs(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_col: str | None = None,
    tables: int = 12,
    planes: int = 3,
    seed: int = 7,
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs (cos ≥ threshold). → (id_a, id_b).

    Bucketing (the blocking step before per-bucket brute force):
    - default: sign-random-projection **LSH buckets** — ``tables``
      independent ``planes``-bit tables; a pair is a candidate when it
      shares a bucket in any table. Needs no semantic column, so it works
      on real corpora. Recall for a pair at cosine c per table is
      (1-acos(c)/π)^planes; defaults give ≥0.95 expected recall at c≥0.4
      (verified against the exact pair set in tests/test_similarity.py).
    - ``bucket_col``: partition by a given column instead (IVF-style when a
      cluster id exists).
    Exact cosine verification inside buckets either way; pair set deduped."""
    from .shuffle import distinct_rows, partitioned_map

    _EDP_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def pairs_in(ids: np.ndarray, m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        order = np.argsort(ids)
        ids = ids[order]
        m = m[order]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        cos = mn @ mn.T
        ia, ib = np.nonzero(np.triu(cos >= threshold, k=1))
        return ids[ia], ids[ib]

    if bucket_col is not None:

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            ids = g[id_col].to_numpy()
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            a_, b_ = pairs_in(ids, m)
            return pd.DataFrame({"id_a": a_, "id_b": b_})

        return ds.groupby(bucket_col).map_groups(per_bucket, batch_format="pandas")

    rng = np.random.RandomState(seed)
    d_holder: dict = {}

    def bucketize(t: pa.Table) -> pa.Table:
        from .similarity import _as_matrix, _ids_i64

        vcol = t[vec_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        m = _as_matrix(vcol)
        if "pm" not in d_holder:
            prng = np.random.RandomState(seed)
            d_holder["pm"] = prng.normal(size=(tables, planes, m.shape[1]))
        pm = d_holder["pm"]
        ids = _ids_i64(t[id_col])
        weights = (1 << np.arange(planes, dtype=np.int64)).astype(np.int64)
        out_t, out_b = [], []
        for ti in range(tables):
            bits = (pm[ti] @ m.T) > 0
            buckets = (bits.T @ weights).astype(np.int64)
            out_t.append(np.full(len(ids), ti, dtype=np.int32))
            out_b.append(buckets)
        # vec column replicated per table via one Arrow take (no python
        # list round trip)
        rep_idx = pa.array(np.tile(np.arange(len(ids), dtype=np.int64), tables))
        return pa.table(
            {
                "table": pa.array(np.concatenate(out_t), type=pa.int32()),
                "bucket": pa.array(np.concatenate(out_b), type=pa.int64()),
                id_col: pa.array(np.tile(ids, tables), type=pa.int64()),
                vec_col: vcol.take(rep_idx),
            }
        )

    rows = ds.map_batches(bucketize, batch_format="pyarrow")

    def per_partition(part: pa.Table) -> pa.Table | None:
        from .shuffle import iter_key_groups

        out_a, out_b = [], []
        for _, g in iter_key_groups(part, ["table", "bucket"]):
            if g.num_rows < 2:
                continue
            from .similarity import _as_matrix, _ids_i64

            ids = _ids_i64(g[id_col])
            m = _as_matrix(g[vec_col])
            a_, b_ = pairs_in(ids, m)
            out_a.append(a_)
            out_b.append(b_)
        if not out_a:
            return None
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            },
            schema=_EDP_SCHEMA,
        )

    cands = partitioned_map(
        rows, ["table", "bucket"], per_partition, empty_schema=_EDP_SCHEMA
    )
    return distinct_rows(cands, ["id_a", "id_b"])


def apply_dedup(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> rd.Dataset:
    """The dedup loop as ONE call: duplicate pairs (from any emitter in this
    module — minhash/simhash/embedding — or any blocking relation) →
    connected components → corpus filtered to one keeper per cluster (the
    component-minimum id; docs in no pair pass through untouched).

    100-TB shape: clustering runs entirely over the pair graph (the small
    derivative); the corpus-side filter is a single ANTI join against the
    non-keeper id set — document bytes never enter the clustering loop and
    stream through exactly one membership probe."""
    from .arrowtools import dataset_pa_schema
    from .graph import connected_components
    from .joins import hash_join

    labels = connected_components(pairs, src=src, dst=dst)

    def non_keepers(t: pa.Table) -> pa.Table:
        drop = pc.not_equal(t["node"], t["cluster_id"])
        return pa.table({id_col: t.filter(drop)["node"]})

    dropped = labels.map_batches(non_keepers, batch_format="pyarrow")
    return hash_join(
        docs,
        dropped,
        id_col,
        how="anti",
        left_schema=dataset_pa_schema(docs),
        right_schema=pa.schema([(id_col, pa.int64())]),
    )
