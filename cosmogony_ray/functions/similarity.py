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

import ray
import ray.data as rd
from .cluster import default_pool


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


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
        ids = np.asarray(t[self.id_col].to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(t[self.vec_col].to_pylist()))
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
        m = _normalize(_as_matrix(t[vec_col].to_pylist()))
        keep = np.zeros(m.shape[0], dtype=bool)
        for ti in range(pm.shape[0]):
            bits = (pm[ti] @ m.T) > 0
            buckets = (bits.T @ weights).astype(np.int64)
            w = want[ti]
            pos = np.searchsorted(w, buckets)
            pos = np.minimum(pos, len(w) - 1) if len(w) else pos
            keep |= (len(w) > 0) & (w[pos] == buckets)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)[keep]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                vec_col: pa.array(
                    [v for v, kp in zip(t[vec_col].to_pylist(), keep) if kp]
                ),
            }
        )

    filtered = ds.map_batches(bucketize, batch_format="pyarrow")
    scored = knn_brute(filtered, queries_ref, k=k, vec_col=vec_col, id_col=id_col)
    return scored
