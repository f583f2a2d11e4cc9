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


def quadratic_block_refs(
    mat,
    n_rows: int,
    rows_per_block: int,
    max_block_pairs: int,
    op_name: str,
    advice: str,
) -> list:
    """Shared layout + budget logic for the exact all-pairs operators
    (jaccard_pairs, cosine_pairs): size the materialized dataset's
    blocks and return its object refs, REFUSING when the scheduled
    block-pair fan-out would exceed `max_block_pairs`. The refusal
    happens BEFORE the repartition shuffle whenever one will run (the
    post-repartition block count is known to be `target`), and is
    checked against the ACTUAL ref count otherwise — an accepted
    incoming layout can carry up to 4x target blocks, i.e. 16x the
    pair count a target-only estimate would admit."""

    def _refuse(nb: int):
        est = nb * (nb + 1) // 2
        if est > max_block_pairs:
            raise ValueError(
                f"{op_name}: exact all-pairs over {n_rows} rows in "
                f"{nb} blocks needs {est} block-pair tasks "
                f"(> max_block_pairs={max_block_pairs}). {advice}"
            )

    target = max(1, n_rows // rows_per_block + 1)
    nb = mat.num_blocks()
    will_repartition = nb > 4 * target or nb < target
    _refuse(target if will_repartition else nb)
    if will_repartition:
        mat = mat.repartition(target).materialize()
    refs = mat.to_arrow_refs()
    _refuse(len(refs))  # invariant re-check on the actual fan-out
    return refs
