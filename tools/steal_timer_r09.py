"""Steal-aware timing helper for round-9 optimization probes.

CPU steal from co-tenants arrives in bursts; a wall-clock sample taken
during a burst is garbage. `timed(fn)` returns (wall_s, steal_s,
idle_frac) for one call so a probe can discard polluted samples:
steal_s is the host-wide stolen CPU seconds during the sample, and a
trustworthy sample has steal_s ~ 0.
"""

from __future__ import annotations

import time


def _stat():
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in f[1:9]]
    return vals


def timed(fn):
    b = _stat()
    t0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - t0
    a = _stat()
    d = [x - y for x, y in zip(a, b)]
    hz = 100.0
    steal_s = d[7] / hz
    total = sum(d) or 1
    idle_frac = d[3] / total
    return out, wall, steal_s, idle_frac


def report(tag, wall, steal_s, idle_frac):
    print(f"{tag}: {wall:.2f}s steal {steal_s:.2f}s idle {idle_frac:.2f}",
          flush=True)
