"""Distributed joins for Ray Data.

``Dataset.join`` (Ray 2.49) delegates to pyarrow's acero hash join, which
rejects nested (list/map/struct) non-key columns. ``hash_join`` here is the
portable partitioned hash join from the Ray Data playbook: pad both sides to a
unified schema, tag the side, ``groupby(key)`` (one shuffle), and emit the
per-key cross product inside ``map_groups`` — nested columns ride along
untouched. Use ``Dataset.join`` for flat schemas; use this when a side
carries nested payloads (geometry lists, tag maps, span structs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_SIDE = "__join_side__"


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    *,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Join two Datasets on ``key`` (same name both sides), preserving nested
    column types. ``how``: "inner" or "left" (left outer).

    Column names (other than the key) must be disjoint between the sides.
    Pass ``left_schema``/``right_schema`` when known to avoid the sample
    execution that ``Dataset.schema()`` triggers on lazy map chains.

    Note: prefer this over ``Dataset.join`` even for flat schemas on small
    clusters — the native join operator reserves ``num_partitions`` aggregator
    CPUs up front and can starve its own upstream stages (observed deadlock at
    4 CPUs); this groupby-based join has no such reservation.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    lschema = left_schema or left.schema()
    rschema = right_schema or right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    unified = pa.schema(
        [(c, ltypes[c]) for c in lcols]
        + [(c, rtypes[c]) for c in rcols]
        + [(_SIDE, pa.int8())]
    )
    out_schema = pa.schema([(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in rcols])

    def pad(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for f in unified:
                if f.name == _SIDE:
                    cols[f.name] = pa.array([side] * t.num_rows, type=pa.int8())
                elif f.name in t.column_names:
                    col = t[f.name]
                    cols[f.name] = col.cast(f.type) if col.type != f.type else col
                else:
                    cols[f.name] = pa.nulls(t.num_rows, type=f.type)
            return pa.table(cols, schema=unified)

        return fn

    unioned = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow")
    )

    def join_group(g: pa.Table) -> pa.Table:
        side = np.asarray(g[_SIDE].to_numpy(zero_copy_only=False))
        lmask = side == 0
        lt = g.filter(pa.array(lmask)).select(lcols)
        rt = g.filter(pa.array(~lmask)).select(rcols)
        nl, nr = lt.num_rows, rt.num_rows
        if nl == 0:
            return out_schema.empty_table()
        if nr == 0:
            if how == "left":
                cols = {c: lt[c] for c in lcols}
                cols.update({c: pa.nulls(nl, type=rtypes[c]) for c in rcols})
                return pa.table(cols, schema=out_schema)
            return out_schema.empty_table()
        li = np.repeat(np.arange(nl, dtype=np.int64), nr)
        ri = np.tile(np.arange(nr, dtype=np.int64), nl)
        cols = {c: lt[c].take(pa.array(li)) for c in lcols}
        cols.update({c: rt[c].take(pa.array(ri)) for c in rcols})
        return pa.table(cols, schema=out_schema)

    return unioned.groupby(key).map_groups(join_group, batch_format="pyarrow")
