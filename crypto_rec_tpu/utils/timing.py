"""Phase timing + throughput counters.

The reference writes per-phase wall-clock ms into the results file
(/root/reference/main.cpp:152,172-173).  We keep that and add queries/s —
the BASELINE.json headline counter — plus an optional jax.profiler trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def hard_sync(out):
    """Force EXECUTION of every array in `out` and return it.

    `jax.block_until_ready` is not sufficient on every backend: the remote
    PJRT tunnel used on this testbed reports buffers "ready" while the
    computation is still queued remotely (measured 2026-08-18: a 2.2-TFLOP
    matmul "completed" in 0.1 ms under block_until_ready vs 38 ms under a
    real host read).  Reading one reduced scalar per leaf back to the host
    is the only observable that guarantees the producing kernels ran.

    All per-leaf scalar reductions are dispatched asynchronously and pulled
    in ONE device_get: the tunnel costs ~20 ms per host round trip, so a
    per-leaf loop of device_gets charged multi-output functions ~20 ms per
    extra leaf (the 6-leaf CF result measured ~120 ms of pure sync).
    """
    scalars = []
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            x = leaf
            if jnp.issubdtype(x.dtype, jnp.bool_):
                x = x.astype(jnp.int32)
            # index ONE element (a zero-d slice) rather than
            # ravel()[:1]: an eager ravel of a multi-dim array is a full
            # layout-changing COPY on TPU — syncing a 10 GB slab tensor
            # transiently doubled its memory and OOM'd the 10M euclidean
            # pack (round 4)
            scalars.append(jnp.max(x[(0,) * x.ndim]))
    if scalars:
        jax.device_get(scalars)
    return out


class PhaseTimer:
    def __init__(self) -> None:
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, trace_dir: Optional[str] = None):
        ctx = (
            jax.profiler.trace(trace_dir)
            if trace_dir
            else contextlib.nullcontext()
        )
        start = time.perf_counter()
        with ctx:
            yield
        self.phases[name] = self.phases.get(name, 0.0) + (
            time.perf_counter() - start
        )

    def ms(self, name: str) -> int:
        return int(self.phases.get(name, 0.0) * 1000)

    def qps(self, name: str, n_queries: int) -> float:
        dt = self.phases.get(name, 0.0)
        return n_queries / dt if dt > 0 else float("inf")
