"""Worker-local cache for broadcast objects.

``ray.get(ref)`` can deserialize the object on every call; fetching a
broadcast map once per *key group* turned the hierarchy argmin into a
deserialization storm (measured: ~100 s for 21.8k groups at 32 CPUs).
``get_cached`` memoizes per worker process."""

from __future__ import annotations

import ray

_CACHE: dict[str, object] = {}


def get_cached(ref):
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    obj = _CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        _CACHE[key] = obj
    return obj


def lookup_sorted_ids(ids_sorted, values):
    """Row indices (int64 numpy, -1 = absent) of integer ``values`` in a
    PRESORTED id array. The zero-setup sibling of ``lookup_int_indices``:
    when the broadcast side ships already sorted (the assembly packs), a
    worker's first batch pays NO per-worker argsort/concat — at 32 workers
    the cached-index builds were ~30% of the assemble stage's total CPU,
    and they scale with worker count (the anti-scaling direction)."""
    import numpy as np

    values = np.asarray(values)
    if len(ids_sorted) == 0:
        return np.full(len(values), -1, dtype=np.int64)
    pos = np.searchsorted(ids_sorted, values)
    pos_c = np.minimum(pos, len(ids_sorted) - 1)
    found = ids_sorted[pos_c] == values
    return np.where(found, pos_c, np.int64(-1))


def cached_str_index(ref, col: str) -> dict:
    """Worker-cached {string value → row index} for a broadcast table column.

    ``pc.index_in`` rebuilds its value_set hash table on EVERY call —
    ~0.3 s per batch against a 350k-row table, turning broadcast-lookup map
    stages quadratic-ish in batch count. A per-worker dict is built once."""
    return get_cached_transformed(
        ref, f"stridx:{col}", lambda t: {v: i for i, v in enumerate(t[col].to_pylist())}
    )


def lookup_str_indices(ref, col: str, values: list):
    """Row indices (int64 numpy, -1 = absent) of ``values`` in the broadcast
    table's ``col`` via the worker-cached dict."""
    import numpy as np

    d = cached_str_index(ref, col)
    return np.fromiter((d.get(v, -1) for v in values), dtype=np.int64, count=len(values))


def cached_sorted_index(ref, col: str):
    """Worker-cached (sorted values, original-row order) for an int column —
    C-speed ``searchsorted`` lookups without per-call hash builds."""
    import numpy as np

    def build(t):
        arr = t[col].to_numpy(zero_copy_only=False)
        order = np.argsort(arr, kind="stable")
        return arr[order], order

    return get_cached_transformed(ref, f"sortidx:{col}", build)


def lookup_int_indices(ref, col: str, values):
    """Row indices (int64 numpy, -1 = absent) of integer ``values`` in the
    broadcast table's ``col``."""
    import numpy as np

    sorted_vals, order = cached_sorted_index(ref, col)
    values = np.asarray(values)
    if len(sorted_vals) == 0:
        return np.full(len(values), -1, dtype=np.int64)
    pos = np.searchsorted(sorted_vals, values)
    pos_c = np.minimum(pos, len(sorted_vals) - 1)
    found = sorted_vals[pos_c] == values
    return np.where(found, order[pos_c], np.int64(-1))


def get_cached_transformed(ref, tag: str, transform):
    """``transform(ray.get(ref))`` computed once per worker process.

    The broadcast object should be an Arrow table (zero-copy from the object
    store — deserializing a large *Python* dict cost ~8 s per worker,
    measured at 87k zones); ``transform`` builds whatever worker-local
    lookup structure the stage needs from it, paid once per worker."""
    key = (ref.hex() if hasattr(ref, "hex") else str(ref)) + ":" + tag
    obj = _CACHE.get(key)
    if obj is None:
        obj = transform(get_cached(ref))
        _CACHE[key] = obj
    return obj
