"""Cluster-size helpers for actor-pool sizing."""

from __future__ import annotations

import ray


def cluster_cpus(default: int = 8) -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def default_pool(reserve: int = 2, cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster, leaving
    ``reserve`` CPUs for neighboring stages so the pool can't starve its own
    producers/consumers (observed deadlock with a full-size fixed pool)."""
    n = max(1, cluster_cpus() - reserve)
    if cap is not None:
        n = min(n, cap)
    return (1, n)
