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
