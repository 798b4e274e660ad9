"""Dedup-family gates.

The adversarial skew tests pin the round-4 LSH bucket cap: a single hot
(band, band_hash) bucket (boilerplate-heavy corpus) must emit a BOUNDED
pair set — star pairs against the min-doc_id representative — instead of
the n(n-1)/2 quadratic blow-up (reference-free engine extension; see
VERDICT round 3 task 1)."""

import numpy as np
import pyarrow as pa
import pytest


def _boilerplate_table(n_dup: int, n_unique: int) -> pa.Table:
    texts = ["the same boilerplate footer text appears on every page of this site"] * n_dup
    texts += [f"unique document number {i} with its own words {i * 7} and {i * 13}" for i in range(n_unique)]
    ids = list(range(n_dup + n_unique))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def test_minhash_bucket_cap_bounds_pairs(ray_session):
    """2000 identical docs land in ONE bucket per band (size >> cap=256);
    the capped emitter must produce exactly the n-1 star pairs (all docs
    stay connected to the keeper component), not ~2M quadratic pairs."""
    import ray.data as rd

    from cosmogony_ray.functions.dedup import LSH_MAX_BUCKET, minhash_lsh_pairs

    n_dup = 2000
    assert n_dup > LSH_MAX_BUCKET
    t = _boilerplate_table(n_dup, 5)
    df = minhash_lsh_pairs(rd.from_arrow(t)).to_pandas()
    got = set(zip(df["doc_a"], df["doc_b"]))
    # star pairs: representative is the min doc_id (0) of the hot bucket
    assert got == {(0, i) for i in range(1, n_dup)}


def test_simhash_bucket_cap_bounds_pairs(ray_session):
    import ray.data as rd

    from cosmogony_ray.functions.dedup import LSH_MAX_BUCKET, simhash_pairs

    n_dup = 1500
    assert n_dup > LSH_MAX_BUCKET
    t = _boilerplate_table(n_dup, 5)
    df = simhash_pairs(rd.from_arrow(t)).to_pandas()
    got = set(zip(df["doc_a"], df["doc_b"]))
    assert got == {(0, i) for i in range(1, n_dup)}
    assert (df["hamming"] == 0).all()


def test_small_buckets_unaffected_by_cap(ray_session):
    """Below the cap the emitter is the exact pairwise set — a 4-dup group
    yields all 6 pairs after verification."""
    import ray.data as rd

    from cosmogony_ray.functions.dedup import minhash_lsh_pairs

    t = _boilerplate_table(4, 3)
    df = minhash_lsh_pairs(rd.from_arrow(t)).to_pandas()
    got = set(zip(df["doc_a"], df["doc_b"]))
    assert got == {(a, b) for a in range(4) for b in range(a + 1, 4)}


def test_md5_hex_batch_matches_hashlib():
    """Buffer-sliced md5 == hashlib md5 over python strs, incl. empties,
    unicode, slices and chunked arrays."""
    import hashlib

    from cosmogony_ray.functions.dedup import _md5_hex_batch

    vals = ["", "hello world", "héllo wörld ünïcode", "a" * 10_000, ""]
    want = [hashlib.md5(s.encode()).hexdigest() for s in vals]
    assert _md5_hex_batch(pa.array(vals)) == want
    assert _md5_hex_batch(pa.array(vals).slice(1, 3)) == want[1:4]
    chunked = pa.chunked_array([pa.array(vals[:2]), pa.array(vals[2:])])
    assert _md5_hex_batch(chunked) == want
    assert _md5_hex_batch(pa.array([], type=pa.string())) == []
    assert _md5_hex_batch(pa.array(vals, type=pa.large_string())) == want


def test_popcount_and_triu_helpers():
    from cosmogony_ray.functions.dedup import _triu_idx

    ia, jb = _triu_idx(4)
    assert list(zip(ia.tolist(), jb.tolist())) == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    ]
    # cache returns the same arrays
    ia2, _ = _triu_idx(4)
    assert ia2 is ia


def test_minhash_pairs_to_clusters_integration(ray_session):
    """The dedup family composed end-to-end: minhash LSH pairs → connected
    components → every emitted pair lands in one cluster, uniques stay
    isolated. Two planted dup groups (different texts) must NOT merge."""
    import ray.data as rd

    from cosmogony_ray.functions.dedup import minhash_lsh_pairs
    from cosmogony_ray.functions.graph import connected_components

    texts = ["common header shared by the first duplicate family of pages here"] * 40
    texts += ["a second distinct boilerplate paragraph repeated across other pages"] * 30
    texts += [
        f"singleton text {i} about topic {i * 3} with extra words {i * 11}"
        for i in range(20)
    ]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})
    pairs = minhash_lsh_pairs(rd.from_arrow(t))
    labels = connected_components(pairs, src="doc_a", dst="doc_b").to_pandas()
    lab = dict(zip(labels["node"], labels["cluster_id"]))
    # family 1 = docs 0..39 -> cluster 0; family 2 = docs 40..69 -> cluster 40
    assert all(lab[i] == 0 for i in range(40))
    assert all(lab[i] == 40 for i in range(40, 70))
    # singletons emit no pairs -> absent from the label table
    assert all(i not in lab for i in range(70, 90))


def test_apply_dedup_end_to_end(ray_session):
    """apply_dedup keeps exactly one doc per duplicate family (the min id)
    and passes uniques through."""
    import ray.data as rd

    from cosmogony_ray.functions.dedup import apply_dedup, minhash_lsh_pairs

    t = _boilerplate_table(50, 10)  # docs 0..49 duplicates, 50..59 unique
    docs = rd.from_arrow(t)
    pairs = minhash_lsh_pairs(docs)
    kept = apply_dedup(docs, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0] + list(range(50, 60))
    # full row survives (text column intact)
    assert set(kept.columns) == {"doc_id", "text"}


def test_token_counts(ray_session):
    """BPE-style pre-tokenizer piece counts: known strings, both counters."""
    import pyarrow as pa
    import ray.data as rd

    from cosmogony_ray.functions.textops import token_counts

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["Hello world", "it's 42 degrees!", ""],
    })
    out = token_counts(rd.from_arrow(docs)).to_pandas().sort_values("doc_id")
    assert list(out["n_ws_tokens"]) == [2, 3, 0]
    # "Hello"," world" = 2; "it","'s"," 42"," degrees","!" = 5; "" = 0
    assert list(out["n_bpe_pieces"]) == [2, 5, 0]
