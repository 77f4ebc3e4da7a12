"""Overlap INDEPENDENT Spark actions from driver threads (guide §2.6).

The cycle-shaped operators (lake setup, CDC landing + view fold, the
dim-arm's three disjoint-key delta writes) execute many small actions whose
only ordering is "the driver called them sequentially" — Spark's scheduler
happily runs several jobs at once inside one application, and each job's
tail leaves cores idle that the next independent job could back-fill. On
local[32] with sf0.1-sized inputs the effect is measured at ~2.2× on a
4-snapshot setup segment (OPTIMIZATION_r13.md); on a cluster the same
overlap back-fills executors freed by a job's straggler tail.

Correctness contract: callers may only overlap actions that are
independent — no read-after-write between thunks, and any shared-table
writes must COMMUTE (disjoint key sets through the newest-wins MOR
resolution; the delta-log append itself is serialized by the commit lock).
Each call site documents why its thunks commute.

Thread notes: concurrent driver-side actions on one SparkSession are
supported; jobs are scheduled FIFO so earlier submissions back-fill first
(exactly the behaviour we want). Job descriptions/localProperties are
thread-local and NOT inherited here — profiling tools that label jobs per
primitive already wrap the primitives themselves.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

_MAX_WORKERS = 4  # enough to hide commit latency, few enough not to fight


def overlap(*thunks):
    """Run the given zero-arg thunks concurrently and return their results
    in submission order. With 0 or 1 thunks this is a plain call (no pool).
    The first raising thunk's exception propagates after all have settled
    (pool shutdown joins every worker — no thunk is abandoned mid-write).
    """
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=min(_MAX_WORKERS, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
