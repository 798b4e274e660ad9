"""Distributed joins for Ray Data.

``Dataset.join`` (Ray 2.49) delegates to pyarrow's acero hash join, which
rejects nested (list/map/struct) non-key columns, and its aggregator-actor
CPU reservation can starve upstream stages on small clusters (observed
deadlock at 4 CPUs). ``hash_join`` here is the portable partitioned hash
join from the Ray Data playbook: pad both sides to a unified schema, tag the
side, hash-bucket the key into ``num_partitions``, ``groupby(bucket)`` (one
shuffle), and join each bucket with ONE vectorized call (pandas merge on
integer row indices + Arrow take) — nested columns ride along untouched and
there is no per-key Python overhead."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .shuffle import PART_COL, add_partition_column

_SIDE = "__join_side__"


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    *,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    num_partitions: int | None = None,
    right_unique: bool = False,
) -> rd.Dataset:
    """Join two Datasets on ``key`` (same name both sides), preserving nested
    column types. ``how``: "inner", "left" (left outer), "semi" (left rows
    WITH a match — left columns only), or "anti" (left rows WITHOUT a match
    — left columns only; the EXISTS / NOT EXISTS filters).

    ``right_unique=True`` declares the right side's keys unique (a lookup
    table): the partition kernel then skips the pandas merge and row
    expansion entirely — one ``pc.index_in`` + null-aware takes, with the
    left columns passing through untouched (measured ~2× on the
    dimension-attach joins whose cost is row-machinery, not payload).
    The claim is VERIFIED per partition (duplicate right keys raise).

    Column names (other than the key) must be disjoint between the sides.
    Pass ``left_schema``/``right_schema`` when known to avoid the sample
    execution that ``Dataset.schema()`` triggers on lazy map chains.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    from .shuffle import default_num_partitions

    num_partitions = num_partitions or default_num_partitions()
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
    if how in ("semi", "anti"):
        out_schema = pa.schema([(c, ltypes[c]) for c in lcols])
    else:
        out_schema = pa.schema(
            [(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in rcols]
        )

    def pad(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for f in unified:
                if f.name == _SIDE:
                    cols[f.name] = pa.array(
                        np.full(t.num_rows, side, dtype=np.int8), type=pa.int8()
                    )
                elif f.name in t.column_names:
                    col = t[f.name]
                    cols[f.name] = col.cast(f.type) if col.type != f.type else col
                else:
                    cols[f.name] = pa.nulls(t.num_rows, type=f.type)
            return add_partition_column(
                pa.table(cols, schema=unified), [key], num_partitions
            )

        return fn

    unioned = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow")
    )

    def join_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns([PART_COL])
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lt = g.filter(pa.array(lmask)).select(lcols)
        rt = g.filter(pa.array(~lmask)).select([key] + rcols)
        if right_unique and rt.num_rows:
            # checked BEFORE the empty-left early-return so a violated
            # uniqueness claim raises on the first run that sees the
            # partition, not on some later run whose left side happens to
            # reference it; mode="all" counts null keys too (count_distinct
            # defaults to only_valid, which would miscount [1, 2, null])
            if pc.count_distinct(rt[key], mode="all").as_py() != rt.num_rows:
                raise ValueError(
                    f"hash_join(right_unique=True): duplicate {key!r} keys "
                    "on the right side"
                )
        if lt.num_rows == 0:
            return out_schema.empty_table()
        if how in ("semi", "anti"):
            # Membership test only — one Arrow is_in against the partition's
            # right keys, no pair expansion and no pandas round-trip (which
            # would coerce nullable int64 to float64 and let NaN match NaN).
            # SQL EXISTS semantics: a NULL key matches nothing, so semi drops
            # null-key left rows and anti keeps them.
            value_set = rt[key].drop_null().combine_chunks()
            matched = pc.fill_null(pc.is_in(lt[key], value_set=value_set), False)
            matched = pc.and_(matched, pc.is_valid(lt[key]))
            keep = matched if how == "semi" else pc.invert(matched)
            return lt.filter(keep)
        if right_unique:
            ri = pc.index_in(lt[key], value_set=rt[key].combine_chunks())
            cols = {c: lt[c] for c in lcols}
            if how == "inner":
                keep = pc.is_valid(ri)
                lt2 = lt.filter(keep)
                ri = ri.filter(keep)
                cols = {c: lt2[c] for c in lcols}
            for c in rcols:
                cols[c] = rt[c].take(ri)  # null index → null row (left outer)
            return pa.table(cols, schema=out_schema)
        lk = pd.DataFrame(
            {key: lt[key].to_pandas(), "__li": np.arange(lt.num_rows, dtype=np.int64)}
        )
        rk = pd.DataFrame(
            {key: rt[key].to_pandas(), "__ri": np.arange(rt.num_rows, dtype=np.int64)}
        )
        m = lk.merge(rk, on=key, how="inner" if how == "inner" else "left")
        if m.empty:
            return out_schema.empty_table()
        li = pa.array(m["__li"].to_numpy())
        cols = {c: lt[c].take(li) for c in lcols}
        if how == "left":
            # null indices → null output rows; works for nested types too
            ri = pa.array(m["__ri"].astype("Int64"))
            for c in rcols:
                cols[c] = rt[c].take(ri)
        else:
            ri = pa.array(m["__ri"].to_numpy().astype(np.int64))
            for c in rcols:
                cols[c] = rt[c].take(ri)
        return pa.table(cols, schema=out_schema)

    return unioned.groupby(PART_COL).map_groups(join_partition, batch_format="pyarrow")
