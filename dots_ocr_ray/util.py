"""Small shared runtime helpers."""

from __future__ import annotations

import ray


def default_pool_size(reserve: int = 1, floor: int = 2) -> int:
    """Actor-pool size that leaves CPU headroom for the read/write
    stages — a pool reserving every CPU starves the other operators and
    the pipeline deadlocks under backpressure (ray_guide pitfall)."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpu = 4
    return max(floor, ncpu - reserve)


def autoscale_pool(reserve: int = 1, floor: int = 2) -> tuple[int, int]:
    """(min, max) actor-pool bounds: small jobs spin 1 actor instead of
    paying a full-width pool ramp; big jobs scale to CPUs-1."""
    return (1, default_pool_size(reserve, floor))
