"""Shared runtime helpers."""

from __future__ import annotations


def actor_pool(num_cpus: float = 1.0, reserve_frac: float = 8.0):
    """Autoscaling actor-pool bounds sized from the CLUSTER, not a magic
    constant: ``(1, cluster_cpus/num_cpus - headroom)``.

    A hardcoded ``concurrency=(1, 8)`` caps a stage at 8 actors on a
    256-node fleet — the pool must track ``ray.cluster_resources()``.
    Headroom (≈cpus/8, ≥1) keeps read/write tasks schedulable: a pool
    whose maximum equals the cluster size can starve the upstream read
    and stall the streaming executor (observed; see
    pipelines/extract_pipeline.run_extract_pipeline).
    """
    import ray

    total = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    slots = int(total / max(num_cpus, 0.25))
    reserve = max(1, int(slots / reserve_frac))
    return (1, max(2, slots - reserve))
