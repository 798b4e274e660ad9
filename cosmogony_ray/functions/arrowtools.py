"""Vectorized Arrow helpers shared by stages (no per-row Python in hot paths)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tags_get(tags: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """Vectorized ``tags[key]`` over a map<string,string> column.

    Returns a string array (null where the key is absent) — the Arrow analog
    of the reference's ``tags.get("...")`` calls (e.g.
    /root/reference/src/lib.rs:31-42).
    """
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    n = len(tags)
    # map array: offsets into a struct<key,value> child
    offsets = tags.offsets.to_numpy(zero_copy_only=False)
    keys = tags.keys
    vals = tags.items
    hit = pc.fill_null(pc.equal(keys, pa.scalar(key)), False)
    hit_np = hit.to_numpy(zero_copy_only=False).astype(bool)
    idx = np.nonzero(hit_np)[0]
    if idx.size == 0:
        return pa.nulls(n, type=pa.string())
    out = np.full(n, -1, dtype=np.int64)
    if idx.size:
        rows = np.searchsorted(offsets, idx, side="right") - 1
        # first match per row wins
        out[rows[::-1]] = idx[::-1]
    mask = out >= 0
    taken = pc.take(vals, pa.array(np.where(mask, out, 0), type=pa.int64()))
    return pc.if_else(pa.array(mask), taken, pa.scalar(None, type=pa.string()))


def materialized_count(ds) -> int:
    """Row count of a MATERIALIZED dataset without launching a streaming
    executor — ``Dataset.count()`` spins one up (AggregateNumRows) and that
    executor intermittently stalled on this host. Prefers the block
    METADATA count (no block fetch at all — on a multi-node cluster the
    ref-based fallback would ship every block to the caller just to count
    rows); falls back to fetching refs only when metadata is absent."""
    import ray

    try:  # metadata fast path (private but stable across Ray 2.x)
        cnt = ds._meta_count()
        if cnt is not None:
            return int(cnt)
    except Exception:
        pass
    return sum(t.num_rows for t in ray.get(ds.to_arrow_refs()))


def materialized_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Whole MATERIALIZED dataset as one Arrow table, fetched straight from
    the object store (``to_arrow_refs`` + ``ray.get``) — no streaming
    executor run. Every driver scan of an already-materialized zone-scale
    table should use this: each ``iter_batches``/``to_pandas`` call spins a
    full executor (~1 s fixed, more under load), which multiplied across
    the build's scans was a measured serial bottleneck."""
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return (schema or ds.schema().base_schema).empty_table()
    return pa.concat_tables(tbls, promote_options="default").combine_chunks()


def map_to_pydicts(tags: pa.ChunkedArray | pa.Array) -> list[dict]:
    """map column → list of python dicts (zone-scale paths only)."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    return [dict(kv) if kv is not None else {} for kv in tags.to_pylist()]


def explode_list_column(
    tbl: pa.Table, list_col: str, keep_cols: list[str], pos_col: str | None = None
) -> pa.Table:
    """Explode ``list_col`` into one row per element, repeating ``keep_cols``.

    Vectorized via list offsets (the Arrow analog of flat_map without per-row
    Python). Struct element columns are flattened as their field names.
    """
    col = tbl[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    parent = np.repeat(np.arange(len(tbl), dtype=np.int64), counts)
    flat = col.flatten()
    out = {}
    for c in keep_cols:
        out[c] = pc.take(tbl[c], pa.array(parent))
    if pa.types.is_struct(flat.type):
        for f in flat.type:
            out[f.name] = pc.struct_field(flat, f.name)
    else:
        out[list_col] = flat
    if pos_col is not None:
        pos = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], counts)
        out[pos_col] = pa.array(pos, type=pa.int32())
    return pa.table(out)


def dataset_pa_schema(ds) -> pa.Schema:
    """pyarrow schema of a Dataset (Ray's Schema wrapper unwrapped; falls
    back to rebuilding from names/types for non-Arrow-backed datasets)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([(n, t) for n, t in zip(s.names, s.types)])
