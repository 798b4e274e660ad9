"""Temporal operators over Ray Data: as-of join and tumbling-window
aggregation.

Neither exists natively in Ray Data; both are expressed as compositions per
the engine's partitioning discipline (hash-partition on the equality key,
ONE vectorized pass per partition — the same shape as sessionization in
``__ray_entry__._q_user_sessions``; per-key ``map_groups`` is a Python call
per key and collapses at 10^5+ keys).

``asof_join`` partitioning assumption: all rows of one ``by`` key (both
sides) fit one hash partition — the same assumption every keyed operator in
this engine makes; a key whose history exceeds a partition's memory needs
time-bucketed pre-splitting, which callers can do by adding a coarse time
bucket to ``by``.

``tumbling_window_agg`` is pre-aggregated inside ``map_batches`` (partial
combine) before the small final shuffle — the 100-TB shape: the shuffle
moves one row per (key, window) per input block, never the event stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .relops import partial_groupby_sum
from .shuffle import partitioned_map

_SIDE_COL = "__side__"


def _ts_us(arr: pa.ChunkedArray) -> np.ndarray:
    """int64 microseconds since epoch for a timestamp/int column."""
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
        return arr.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    value_cols: list[str],
    num_partitions: int | None = None,
) -> rd.Dataset:
    """For every left row, attach ``value_cols`` from the LATEST right row of
    the same ``by`` key with ``right.on <= left.on`` (inclusive — DuckDB
    ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on`` semantics); null
    when no such row. Output = left columns + value_cols.

    Ties inside the right side (duplicate (by, on)) are resolved toward the
    LARGEST row position after an in-partition stable sort by (by, on) —
    callers wanting deterministic tie values should pre-aggregate the right
    side to unique (by, on), as the oracle-checked query does.

    Implementation: union both (column-pruned) sides with a side tag, hash-
    partition on ``by``, then per partition ONE vectorized merge: lexsort by
    (by, on, side) with right-before-left at equal ``on``, propagate the
    last-seen right row index with ``np.maximum.accumulate``, and null out
    matches that crossed a ``by`` boundary. No per-key Python loop.
    """
    from .arrowtools import dataset_pa_schema as _pa_schema

    left_schema = _pa_schema(left)
    left_names = list(left_schema.names)
    if set(value_cols) & set(left_names):
        raise ValueError(
            f"value_cols {sorted(set(value_cols) & set(left_names))} collide "
            "with left columns — rename the right-side value columns first"
        )
    out_fields = [(n, left_schema.field(n).type) for n in left_names]
    right_schema = _pa_schema(right)
    out_fields += [(c, right_schema.field(c).type) for c in value_cols]
    out_schema = pa.schema(out_fields)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols: dict[str, object] = {}
            for n in left_names:
                cols[n] = t[n] if side == 1 else pa.nulls(t.num_rows, left_schema.field(n).type)
            for c in value_cols:
                cols[c] = t[c] if side == 0 else pa.nulls(t.num_rows, right_schema.field(c).type)
            if side == 0:  # right: by/on live in left-named columns too
                cols[by] = t[by]
                cols[on] = t[on]
            cols[_SIDE_COL] = pa.array(np.full(t.num_rows, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    lt = left.map_batches(tag(1), batch_format="pyarrow")
    rt = right.select_columns([by, on] + value_cols).map_batches(
        tag(0), batch_format="pyarrow"
    )
    both = lt.union(rt)

    def merge(t: pa.Table) -> pa.Table:
        side = t[_SIDE_COL].to_numpy(zero_copy_only=False)
        key = t[by].to_numpy(zero_copy_only=False)
        ts = _ts_us(t[on])
        order = np.lexsort((side, ts, key))  # right (0) before left (1) at ties
        s_key, s_side = key[order], side[order]
        n = len(order)
        # last-seen right row position (+1; 0 = none), within the sort order
        right_pos = np.where(s_side == 0, np.arange(1, n + 1), 0)
        seen = np.maximum.accumulate(right_pos)
        is_left = s_side == 1
        match = seen[is_left]  # 1-based index into sort order, 0 = none
        valid = match > 0
        # null out matches that point at a different key's right row
        m_idx = np.where(valid, match - 1, 0)
        valid &= s_key[m_idx] == s_key[np.nonzero(is_left)[0]]
        left_orig = order[is_left]
        right_orig = order[m_idx]
        out: dict[str, object] = {}
        for nm in left_names:
            out[nm] = t[nm].take(pa.array(left_orig, type=pa.int64()))
        vmask = pa.array(valid)
        for c in value_cols:
            taken = t[c].take(pa.array(right_orig, type=pa.int64()))
            out[c] = pc.if_else(vmask, taken, pa.nulls(len(valid), right_schema.field(c).type))
        return pa.table(out, schema=out_schema)

    return partitioned_map(
        both, [by], merge, empty_schema=out_schema, num_partitions=num_partitions
    )


def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    by: str,
    ts: str,
    start: str,
    end: str,
    value_cols: list[str],
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Range join for NON-OVERLAPPING intervals per ``by`` key: attach
    ``value_cols`` of the interval containing each point
    (``start <= ts <= end`` inclusive); null when none. Built on
    ``asof_join`` (match the latest interval start at-or-before the point,
    then validate the end bound) — O(n log n) per partition, no interval
    expansion. Overlapping intervals per key need a bucket-expansion join
    (the inclusion cell join's shape); this operator raises no error for
    them but matches only the latest-starting candidate, so callers must
    guarantee disjointness (e.g. session spans, maintenance windows)."""
    # The rename below turns the intervals' `start` column into `ts`; if the
    # intervals schema already carries a column by that name the rename would
    # produce duplicates and asof_join would silently read the wrong one.
    iv_names = set(intervals.schema().names)
    if ts in iv_names and ts != start:
        raise ValueError(
            f"interval_join: intervals already have a column named {ts!r} "
            f"(reserved for the renamed {start!r}); rename it first"
        )
    iv = intervals.map_batches(
        lambda t: t.rename_columns([ts if c == start else c for c in t.column_names]),
        batch_format="pyarrow",
    )
    joined = asof_join(
        points,
        iv,
        by=by,
        on=ts,
        value_cols=[end] + value_cols,
        num_partitions=num_partitions,
    )

    def bound(t: pa.Table) -> pa.Table:
        ok = pc.and_kleene(
            pc.is_valid(t[end]),
            pc.less_equal(
                t[ts].cast(pa.timestamp("us")) if pa.types.is_timestamp(t[ts].type) else t[ts],
                t[end].cast(pa.timestamp("us")) if pa.types.is_timestamp(t[end].type) else t[end],
            ),
        )
        out = {}
        for c in t.column_names:
            if c == end:
                continue
            out[c] = (
                pc.if_else(pc.fill_null(ok, False), t[c], pa.nulls(t.num_rows, t[c].type))
                if c in value_cols
                else t[c]
            )
        return pa.table(out)

    return joined.map_batches(bound, batch_format="pyarrow")


def tumbling_window_agg(
    ds: rd.Dataset,
    *,
    ts_col: str,
    window_s: int,
    keys: list[str],
    sums: dict[str, str],
    counts: str | None = None,
    window_col: str = "window_start_s",
) -> rd.Dataset:
    """Tumbling-window aggregate: floor ``ts_col`` to ``window_s``-second
    windows (int64 epoch seconds — integral on both the Ray and SQL sides so
    hashes compare exactly), then ``partial_groupby_sum`` over
    keys + window. Sum columns must already be integers per this repo's
    e4/cents convention (__ray_entry__ module docstring)."""
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def add_window(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[ts_col])
        w = (ts // win_us) * np.int64(window_s)
        return t.append_column(window_col, pa.array(w, type=pa.int64()))

    windowed = ds.map_batches(add_window, batch_format="pyarrow")
    return partial_groupby_sum(windowed, keys + [window_col], sums, counts=counts)


def sliding_window_agg(
    ds: rd.Dataset,
    *,
    ts_col: str,
    window_s: int,
    slide_s: int,
    keys: list[str],
    sums: dict[str, str],
    counts: str | None = None,
    window_col: str = "window_start_s",
) -> rd.Dataset:
    """Sliding (hopping) window aggregate: every event contributes to the
    ``window_s / slide_s`` overlapping windows that cover it (``window_s``
    must be an exact multiple of ``slide_s``). Expansion is one vectorized
    ``np.repeat`` per batch — k rows per event BEFORE the per-batch partial
    aggregation, so the shuffle still moves one row per (key, window) per
    block, never k× the event stream. Window starts are int64 epoch
    seconds, same convention as ``tumbling_window_agg``."""
    if window_s % slide_s != 0:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s
    slide_us = np.int64(slide_s) * np.int64(1_000_000)

    def explode_windows(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[ts_col])
        w0 = (ts // slide_us) * np.int64(slide_s)  # latest start covering ts
        n = len(ts)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        w = np.repeat(w0, k) - np.tile(
            np.arange(k, dtype=np.int64) * np.int64(slide_s), n
        )
        out = t.take(pa.array(idx))
        return out.append_column(window_col, pa.array(w, type=pa.int64()))

    exploded = ds.map_batches(explode_windows, batch_format="pyarrow")
    return partial_groupby_sum(exploded, keys + [window_col], sums, counts=counts)
