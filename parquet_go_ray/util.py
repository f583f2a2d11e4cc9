"""Small shared helpers for sizing Ray Data stages."""

from __future__ import annotations


def autoscale_concurrency(lo: int = 2, reserve: int = 2) -> tuple[int, int]:
    """Autoscaling actor-pool bounds for a stateful map_batches stage:
    (lo, cluster CPUs - reserve). The reserve keeps input read/transform
    tasks schedulable so a full-size pool can't starve its own producers
    and deadlock the pipeline (see sandbox note: a pool >= session CPUs
    hangs); on a multi-node cluster the streaming executor spreads the
    pool across nodes with the same bound."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    hi = max(lo, cpus - reserve)
    return (lo, hi)
