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
