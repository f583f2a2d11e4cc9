"""Ray Data execution-context tuning applied at the engine's entry
points (__ray_entry__, bench.py, the test session fixture, the CLI).

Why this exists: Ray 2.49's streaming generator buffer defaults to 2
blocks per read task (`DataContext._max_num_blocks_in_streaming_gen_
buffer`). A single-file parquet read runs as ONE generator task that
yields split blocks; with a 2-block runahead the reader stalls after
every other block until a downstream task frees the buffer, so the
whole pipeline serializes behind the reader even with 31 idle CPUs.
Measured on the 47 MB single-row-group lineitem table (read ->
encode/decode roundtrip, 32 CPUs): buffer 2 = 2.56 s, 8 = 1.54 s,
16 = 1.27 s, 32 = 0.94 s, 64 = 0.93 s — a 2.7x pipeline speedup with
zero code change. Real 100-TB layouts have many files so the reader
count, not the per-reader runahead, provides the parallelism — but a
larger runahead still smooths the handoff and costs only object-store
space, which is budgeted by the executor's per-operator reservation
and spillable. 32 is the measured knee.

Env overrides: GRAFT_NO_CTX_TUNING=1 disables entirely;
GRAFT_GEN_BUFFER=<n> changes the runahead.
"""

from __future__ import annotations

import os


def apply_data_context_tuning(ctx=None) -> None:
    """Idempotent; safe before ray.init (DataContext is process-local)."""
    if os.environ.get("GRAFT_NO_CTX_TUNING"):
        return
    from ray.data.context import DataContext

    ctx = ctx or DataContext.get_current()
    ctx._max_num_blocks_in_streaming_gen_buffer = int(
        os.environ.get("GRAFT_GEN_BUFFER", "32")
    )


import contextlib


@contextlib.contextmanager
def runahead(n: int):
    """Temporarily set the streaming-generator runahead. Ray snapshots
    the DataContext into each dataset AT CREATION (verified: a pipeline
    created under buffer=32 keeps it even if the global is reset to 2
    before execution), so wrapping pipeline CONSTRUCTION is sufficient
    and concurrent pipelines built outside the block are unaffected.

    The encode pipelines pin runahead to ENCODE_RUNAHEAD: the encode
    kernel is memory-bandwidth bound, and a large runahead lets every
    task run flat out concurrently, peaking bus contention — measured
    on the sf0.1 headline at 32 CPUs: buffer 4 = 0.197 s, 8 = 0.286 s,
    32 = 0.303 s. Read->transform pipelines want the big global buffer
    instead (single-file reads serialize at buffer 2: lineitem
    roundtrip 2.56 s -> 0.94 s at 32)."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    old = ctx._max_num_blocks_in_streaming_gen_buffer
    ctx._max_num_blocks_in_streaming_gen_buffer = n
    try:
        yield
    finally:
        ctx._max_num_blocks_in_streaming_gen_buffer = old


ENCODE_RUNAHEAD = int(os.environ.get("GRAFT_ENCODE_GEN_BUFFER", "4"))
