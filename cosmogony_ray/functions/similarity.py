"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact top-k cosine per query — queries broadcast once
  (``ray.put``), per-batch numpy matmul, per-batch partial top-k, final
  exact merge in a tiny groupby. The baseline ANN path.
- ``knn_lsh``: random-hyperplane LSH bucketing (seeded) — the scale path:
  candidates limited to matching buckets (multi-probe), then exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from .cluster import default_pool


def _as_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from an embedding column. For an Arrow
    list<float> column (the batch hot path) this is one vectorized
    flatten+reshape — no per-row Python object materialization (round-4
    rework of the to_pylist()+np.stack pattern, ~10× on 4k×64 batches);
    python lists / ragged input fall back to np.stack."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        n = len(col)
        try:
            flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            if n > 0 and col.null_count == 0 and flat.size % n == 0:
                d = flat.size // n
                lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
                if (lens == d).all():
                    return flat.astype(np.float64, copy=False).reshape(n, d)
        except pa.ArrowInvalid:
            pass
        col = col.to_pylist()
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _ids_i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return np.asarray(col, dtype=np.int64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


class _BruteScorer:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qmat = q["mat"]  # normalized (nq, d)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = _ids_i64(t[self.id_col])
        m = _normalize(_as_matrix(t[self.vec_col]))
        cos = self.qmat @ m.T  # (nq, nb)
        k = min(self.k, cos.shape[1])
        out_q, out_v, out_c = [], [], []
        for qi in range(cos.shape[0]):
            # partial top-k inside the batch (merged exactly downstream)
            part = np.argpartition(-cos[qi], k - 1)[:k]
            out_q.extend([int(self.qids[qi])] * len(part))
            out_v.extend(ids[part].tolist())
            out_c.extend(cos[qi][part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )


def broadcast_queries(ds: rd.Dataset, query_ids: list[int], vec_col: str, id_col: str):
    """Collect the (tiny) query set and broadcast its normalized matrix."""
    rows = []
    qset = set(query_ids)
    for t in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        for i, v in zip(t[id_col].to_pylist(), t[vec_col].to_pylist()):
            if i in qset:
                rows.append((i, np.asarray(v, dtype=np.float64)))
    rows.sort()
    mat = _normalize(np.stack([r[1] for r in rows]))
    return ray.put({"ids": [r[0] for r in rows], "mat": mat})


def knn_brute(
    ds: rd.Dataset,
    queries_ref,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """→ (query_id, vec_id, rank) exact top-k by cosine (ties → smaller
    vec_id, matching ``ORDER BY cos DESC, vec_id`` oracles)."""
    partials = ds.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={
            "queries_ref": queries_ref,
            "k": k,
            "vec_col": vec_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=default_pool(),
        num_cpus=1,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "vec_id": g["vec_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def knn_lsh(
    ds: rd.Dataset,
    queries_ref,
    k: int = 10,
    tables: int = 5,
    planes: int = 6,
    seed: int = 42,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Multi-table multi-probe LSH ANN: ``tables`` independent
    sign-random-projection hash tables of ``planes`` bits; a vector is a
    candidate for a query if, in ANY table, its bucket is within hamming
    distance ≤ ``probes`` of the query's bucket. Exact cosine re-rank over
    the candidate set. → (query_id, vec_id, rank).

    Single-table single-probe had a recall cliff (0.26 recall@10 on the
    sf0.01 embeddings, whose true top-10 neighbors sit at cosine ~0.3 —
    near-hyperplane for every plane). Measured recall@10 vs the exact
    ``knn_brute`` oracle on sf0.01 (5 queries): defaults (5×6 bits,
    probes=2) → ≥0.9, asserted in tests/test_similarity.py. On clustered
    real-scale corpora the same machinery runs with deeper ``planes`` (and
    hence far smaller candidate fractions); the knobs trade recall for
    candidate-set size."""
    q = ray.get(queries_ref)
    d = q["mat"].shape[1]
    rng = np.random.RandomState(seed)
    planes_m = rng.normal(size=(tables, planes, d))
    planes_ref = ray.put(planes_m)
    weights = (1 << np.arange(planes, dtype=np.uint32)).astype(np.int64)
    # per table: probe-set of bucket ids per query → wanted bucket set
    wanted_per_table: list[set[int]] = [set() for _ in range(tables)]
    for ti in range(tables):
        qbits = (planes_m[ti] @ q["mat"].T) > 0  # (planes, nq)
        qbuckets = (qbits.T @ weights).astype(np.int64)
        for b in qbuckets.tolist():
            frontier = {int(b)}
            seen = {int(b)}
            for _ in range(probes):
                nxt = set()
                for bb in frontier:
                    for bit in range(planes):
                        nb = bb ^ (1 << bit)
                        if nb not in seen:
                            seen.add(nb)
                            nxt.add(nb)
                frontier = nxt
            wanted_per_table[ti] |= seen
    wanted_ref = ray.put(
        [np.array(sorted(w), dtype=np.int64) for w in wanted_per_table]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        from .broadcast import get_cached

        pm = get_cached(planes_ref)
        want = get_cached(wanted_ref)
        m = _normalize(_as_matrix(t[vec_col]))
        keep = np.zeros(m.shape[0], dtype=bool)
        for ti in range(pm.shape[0]):
            bits = (pm[ti] @ m.T) > 0
            buckets = (bits.T @ weights).astype(np.int64)
            w = want[ti]
            pos = np.searchsorted(w, buckets)
            pos = np.minimum(pos, len(w) - 1) if len(w) else pos
            keep |= (len(w) > 0) & (w[pos] == buckets)
        ids = _ids_i64(t[id_col])[keep]
        vcol = t[vec_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                vec_col: vcol.filter(pa.array(keep)),
            }
        )

    filtered = ds.map_batches(bucketize, batch_format="pyarrow")
    scored = knn_brute(filtered, queries_ref, k=k, vec_col=vec_col, id_col=id_col)
    return scored


def train_ivf_centroids(
    ds: rd.Dataset,
    n_centroids: int = 64,
    sample_rows: int = 8192,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Driver-side spherical k-means over a deterministic sample → broadcast
    normalized centroid matrix (k, d). The IVF "train" phase: the sample is
    selected by a PER-ROW hash predicate on ``id_col`` (round-3 ADVICE fix
    — the old "first 2N rows from iter_batches" depended on block arrival
    order, which is not guaranteed on multi-node or re-ordered reads), so
    the sampled set — hence centroids and ANN recall — is identical run to
    run and unbiased across the corpus (the old head sample was also
    head-biased). Init is every (n/k)-th sample vector, and Lloyd iterations
    run on the driver — training is O(sample) by design; the corpus itself
    never leaves the cluster (the assignment phase in ``knn_ivf`` is a
    distributed map). The classic IVF-Flat layout (Sivic & Zisserman's
    inverted file; FAISS IVF family)."""
    n_total = ds.count()  # parquet metadata count — no full scan
    if n_total == 0:
        raise ValueError("cannot train IVF centroids on an empty dataset")
    # oversample 3x via the hash predicate, then keep the sample_rows rows
    # with the smallest hash (deterministic regardless of block order)
    frac = min(1.0, 3.0 * sample_rows / n_total)
    A, B = np.uint64(0x9E3779B97F4A7C15), np.uint64(0x2545F4914F6CDD1D)
    threshold = np.uint64(min(int(frac * float(2**64 - 1)), 2**64 - 1))

    def _mix(ids: np.ndarray) -> np.ndarray:
        h = (ids.astype(np.uint64) + B) * A       # u64 wraparound bijection
        return (h ^ (h >> np.uint64(31))) * B     # finalizer mix

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = _mix(np.asarray(ids, dtype=np.int64)) <= threshold
        return t.filter(pa.array(keep))

    sampled = (
        ds.select_columns([id_col, vec_col])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    )
    rows = [(r[id_col], r[vec_col]) for r in sampled]
    # order by (hash, id): a hash-prefix cut stays deterministic even if
    # the oversample returns more rows than needed
    rows.sort(key=lambda r: (int(_mix(np.array([r[0]], dtype=np.int64))[0]), r[0]))
    rows = rows[:sample_rows]
    mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for _, v in rows]))
    k = min(n_centroids, mat.shape[0])
    step = max(1, mat.shape[0] // k)
    cent = mat[::step][:k].copy()
    for _ in range(iters):
        assign = np.argmax(cent @ mat.T, axis=0)  # (n,)
        for c in range(k):
            sel = assign == c
            if sel.any():
                v = mat[sel].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return ray.put(cent)


def knn_ivf(
    ds: rd.Dataset,
    queries_ref,
    centroids_ref,
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """IVF-Flat ANN: every vector belongs to its nearest centroid's inverted
    list; a query scores ONLY the lists of its ``nprobe`` closest centroids.
    → (query_id, vec_id, rank).

    Scale shape: the expensive (nq × candidates) cosine matmul runs only on
    rows whose cluster is probed by at least one query — the pruning happens
    BEFORE any query-vector distance computation (one (k_cent × batch)
    assignment matmul per batch, k_cent ≪ nq·d work), and with a
    cluster-PARTITIONED corpus layout (write the assignment column +
    hive-partition by it) the non-probed lists are never even read. Exact
    cosine re-rank inside the probed lists; recall@10 ≥ 0.9 vs ``knn_brute``
    asserted in tests/test_similarity.py."""
    q = ray.get(queries_ref)
    cent = ray.get(centroids_ref)  # (k_cent, d), normalized
    qsim = q["mat"] @ cent.T  # (nq, k_cent)
    npb = min(nprobe, cent.shape[0])
    probe = np.argpartition(-qsim, npb - 1, axis=1)[:, :npb]  # (nq, npb)
    probed_any = np.zeros(cent.shape[0], dtype=bool)
    probed_any[probe.ravel()] = True
    # per-query probe membership matrix (nq, k_cent)
    pmat = np.zeros((q["mat"].shape[0], cent.shape[0]), dtype=bool)
    for qi in range(probe.shape[0]):
        pmat[qi, probe[qi]] = True
    state_ref = ray.put({"pmat": pmat, "any": probed_any})

    class _IVFScorer:
        def __init__(self):
            st = ray.get(state_ref)
            qq = ray.get(queries_ref)
            self.cent = ray.get(centroids_ref)
            self.pmat = st["pmat"]
            self.any = st["any"]
            self.qids = qq["ids"]
            self.qmat = qq["mat"]

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = _ids_i64(t[id_col])
            m = _normalize(_as_matrix(t[vec_col]))
            assign = np.argmax(self.cent @ m.T, axis=0)  # (nb,)
            cand = self.any[assign]
            if not cand.any():
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "vec_id": pa.array([], type=pa.int64()),
                        "cos": pa.array([], type=pa.float64()),
                    }
                )
            ids = ids[cand]
            m = m[cand]
            assign = assign[cand]
            cos = self.qmat @ m.T  # (nq, n_cand)
            allowed = self.pmat[:, assign]  # (nq, n_cand)
            cos = np.where(allowed, cos, -np.inf)
            kk = min(k, cos.shape[1])
            out_q, out_v, out_c = [], [], []
            for qi in range(cos.shape[0]):
                part = np.argpartition(-cos[qi], kk - 1)[:kk]
                good = part[np.isfinite(cos[qi][part])]
                out_q.extend([int(self.qids[qi])] * len(good))
                out_v.extend(ids[good].tolist())
                out_c.extend(cos[qi][good].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_v, type=pa.int64()),
                    "cos": pa.array(out_c, type=pa.float64()),
                }
            )

    partials = ds.map_batches(
        _IVFScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=default_pool(),
        num_cpus=1,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "vec_id": g["vec_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def ivf_write_partitioned(
    ds: rd.Dataset,
    centroids_ref,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF inverted-file LAYOUT: assign each vector to its
    nearest centroid and write hive-partitioned parquet (one directory per
    cluster). At query time ``knn_ivf_partitioned`` reads ONLY the probed
    clusters' partitions — the storage-level pruning that makes IVF the ANN
    scale path (non-probed lists never leave storage), and a resumable
    layout (a failed build can skip finished partitions)."""

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(centroids_ref)
        m = _normalize(_as_matrix(t[vec_col]))
        a = np.argmax(cent @ m.T, axis=0).astype(np.int32)
        return t.append_column("cluster", pa.array(a, type=pa.int32()))

    ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["cluster"])


def knn_ivf_partitioned(
    index_dir: str,
    queries_ref,
    centroids_ref,
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Query an ``ivf_write_partitioned`` layout: read ONLY the probed
    clusters' partition directories, then exact re-rank (same scorer and
    tie-breaks as ``knn_ivf``; identical results on the same centroids)."""
    import os

    q = ray.get(queries_ref)
    cent = ray.get(centroids_ref)
    qsim = q["mat"] @ cent.T
    npb = min(nprobe, cent.shape[0])
    probe = np.argpartition(-qsim, npb - 1, axis=1)[:, :npb]
    # filesystem-aware partition listing (round-3 ADVICE): a remote URI or a
    # mistyped index_dir must raise, not silently return an empty result
    from pyarrow import fs as pafs

    if "://" in index_dir:
        fsys, root = pafs.FileSystem.from_uri(index_dir)
    else:
        fsys, root = pafs.LocalFileSystem(), index_dir
    try:
        infos = fsys.get_file_info(pafs.FileSelector(root, recursive=False))
    except (FileNotFoundError, OSError) as e:
        raise FileNotFoundError(f"IVF index dir not readable: {index_dir}") from e
    cluster_dirs = {
        i.base_name: i.path
        for i in infos
        if i.type == pafs.FileType.Directory and i.base_name.startswith("cluster=")
    }
    if not cluster_dirs:
        raise FileNotFoundError(
            f"no cluster=* partitions under IVF index dir {index_dir} — "
            "not an ivf_write_partitioned layout"
        )
    wanted = sorted(set(int(c) for c in probe.ravel()))
    paths = []
    for c in wanted:
        d = cluster_dirs.get(f"cluster={c}")
        if d is None:
            continue  # probed cluster genuinely empty in the corpus
        # read_parquet with a LIST of paths expects files, not directories
        paths.extend(
            sorted(
                i.path
                for i in fsys.get_file_info(pafs.FileSelector(d, recursive=False))
                if i.type == pafs.FileType.File and i.path.endswith(".parquet")
            )
        )
    if not paths:
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        )
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])
    return knn_ivf(
        ds, queries_ref, centroids_ref, k=k, nprobe=nprobe,
        vec_col=vec_col, id_col=id_col,
    )


def fixed_centroids(k: int = 8, d: int = 64, seed: int = 123) -> np.ndarray:
    """Deterministic data-independent unit centroids (seeded Gaussian,
    normalized, float64) — a fixed coarse quantizer. Exists so the
    assignment kernel can be VALUE-oracle-checked: a trained quantizer
    depends on the corpus, but these literals can be reproduced inside a
    static SQL oracle (same seed → same floats on both sides)."""
    rng = np.random.RandomState(seed)
    c = rng.randn(k, d)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def assign_clusters(
    ds: rd.Dataset,
    centroids_ref,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """(id, cluster): nearest-centroid assignment — the IVF coarse
    quantizer as a standalone distributed map (one (batch × k) float64
    matmul per batch against the broadcast centroid matrix; ties break to
    the smallest centroid index, np.argmax's first-max rule)."""
    from .broadcast import get_cached

    def fn(t: pa.Table) -> pa.Table:
        cent = get_cached(centroids_ref)
        m = _as_matrix(t[vec_col])
        a = np.argmax(m @ cent.T, axis=1)
        return pa.table(
            {id_col: t[id_col], "cluster": pa.array(a, type=pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")
