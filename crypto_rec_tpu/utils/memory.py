"""Device-memory accounting.

The reference hand-rolls getSize() byte counters on every index class
(cust_hashtable.hpp:128-138, vector_bucket.hpp:57-63, each generator).
Here the equivalents are (a) exact nbytes of the arrays that make up an
index (checkpoint.index_nbytes) and (b) live-array / device-memory stats
straight from the runtime.
"""

from __future__ import annotations

from typing import Dict

import jax


def live_array_bytes() -> int:
    """Total bytes of live jax arrays on all devices."""
    return sum(a.nbytes for a in jax.live_arrays())


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device allocator stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = dict(d.memory_stats() or {})
        except Exception:
            stats[str(d)] = {}
    return stats


def format_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}PiB"
