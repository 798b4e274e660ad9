"""Partition-wise grouped execution.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per DISTINCT KEY
— a Python call (plus table slicing) per group, which collapses at high key
cardinality (measured: 8× slowdown growing CPUs on a small build, since the
per-group overhead dominates). The scalable shape is the explicit
partitioned shuffle (ray_guide "Joins and lookups"): hash the key into
``num_partitions`` buckets, ``groupby(bucket)`` once, and process each
bucket with ONE vectorized call that iterates contiguous key runs locally.

``grouped_map`` is the reusable primitive; ``iter_key_groups`` yields
zero-copy contiguous slices per key after one in-partition sort."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

PART_COL = "__part__"


def default_num_partitions(min_partitions: int = 32) -> int:
    """Cluster-scaled shuffle fan-out: 2 buckets per cluster CPU (so a
    straggling bucket can rebalance), floored at ``min_partitions``.
    Round-3 fix for the hard-coded 32 in the relational/dedup paths — on a
    256-node cluster the old constant made every bucket hold 1/32nd of the
    input regardless of cluster size. Override with the
    ``COSMOGONY_SHUFFLE_PARTITIONS`` env var; callers that know their key
    cardinality or input size should pass an explicit count instead.
    Partition count affects block layout only, never results."""
    import os

    env = os.environ.get("COSMOGONY_SHUFFLE_PARTITIONS")
    if env:
        return max(1, int(env))
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(min_partitions, 2 * cpus)


def add_partition_column(
    t: pa.Table, keys: list[str], num_partitions: int
) -> pa.Table:
    """Deterministic hash-bucket column over the key columns (vectorized)."""
    df = pd.DataFrame({k: t[k].to_pandas() for k in keys})
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return t.append_column(PART_COL, pa.array(part, type=pa.int32()))


def iter_key_groups(t: pa.Table, keys: list[str]) -> Iterator[tuple[tuple, pa.Table]]:
    """Sort by keys once, then yield (key_tuple, zero-copy slice) per key."""
    if t.num_rows == 0:
        return
    t = t.sort_by([(k, "ascending") for k in keys])
    key_arrs = [t[k].to_numpy(zero_copy_only=False) for k in keys]
    n = t.num_rows
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for arr in key_arrs:
        change[1:] |= arr[1:] != arr[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        yield tuple(arr[s] for arr in key_arrs), t.slice(s, e - s)


def grouped_map(
    ds: rd.Dataset,
    keys: list[str],
    fn: Callable[[tuple, pa.Table], pa.Table | None],
    *,
    num_partitions: int | None = None,
    empty_schema: pa.Schema,
) -> rd.Dataset:
    """Apply ``fn(key_tuple, group_table) -> Table|None`` to every key group,
    with ONE Ray task per hash partition (not per key)."""
    num_partitions = num_partitions or default_num_partitions()
    parted = ds.map_batches(
        lambda t: add_partition_column(t, keys, num_partitions),
        batch_format="pyarrow",
    )

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.drop_columns([PART_COL])
        outs = []
        for key, g in iter_key_groups(part, keys):
            r = fn(key, g)
            if r is not None and r.num_rows > 0:
                outs.append(r)
        if not outs:
            return empty_schema.empty_table()
        # combine_chunks is load-bearing: per-group outputs are often 1-row
        # tables, and concat alone yields one chunk PER GROUP (measured:
        # a 3.5k-row zone block with 3.5k chunks made every downstream
        # stage — select, serialize, driver fetch — seconds-slow)
        return pa.concat_tables(outs, promote_options="default").combine_chunks()

    return parted.groupby(PART_COL).map_groups(per_partition, batch_format="pyarrow")


def partitioned_map(
    ds: rd.Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table | None],
    *,
    num_partitions: int | None = None,
    empty_schema: pa.Schema,
    num_cpus: float | None = None,
) -> rd.Dataset:
    """Apply ONE vectorized ``fn(partition_table) -> Table|None`` per hash
    partition (all rows of a key land in the same partition). Use instead of
    ``grouped_map`` whenever the per-key work can be expressed vectorized
    over the whole partition — per-key Python calls at 10^5+ keys are the
    collapse this module's docstring describes."""
    num_partitions = num_partitions or default_num_partitions()
    parted = ds.map_batches(
        lambda t: add_partition_column(t, keys, num_partitions),
        batch_format="pyarrow",
    )

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.drop_columns([PART_COL])
        out = fn(part)
        if out is None or out.num_rows == 0:
            return empty_schema.empty_table()
        return out.combine_chunks()

    kwargs = {"num_cpus": num_cpus} if num_cpus is not None else {}
    return parted.groupby(PART_COL).map_groups(
        per_partition, batch_format="pyarrow", **kwargs
    )


def distinct_rows(
    ds: rd.Dataset, keys: list[str], *, num_partitions: int | None = None
) -> rd.Dataset:
    """Exact distinct on key columns — partition-wise vectorized
    drop-duplicates (first occurrence after in-partition key sort)."""
    num_partitions = num_partitions or default_num_partitions()
    parted = ds.map_batches(
        lambda t: add_partition_column(t, keys, num_partitions),
        batch_format="pyarrow",
    )

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.drop_columns([PART_COL])
        if part.num_rows == 0:
            return part
        part = part.sort_by([(k, "ascending") for k in keys])
        arrs = [part[k].to_numpy(zero_copy_only=False) for k in keys]
        keep = np.zeros(part.num_rows, dtype=bool)
        keep[0] = True
        for arr in arrs:
            keep[1:] |= arr[1:] != arr[:-1]
        return part.filter(pa.array(keep))

    return parted.groupby(PART_COL).map_groups(per_partition, batch_format="pyarrow")
