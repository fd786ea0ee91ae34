#!/usr/bin/env python
"""Sample /proc/stat hypervisor steal in fixed windows.

Usage: python scripts/steal_sampler.py [interval_sec] > steal.log &

Prints one line per window: unix_ts steal_pct busy_pct.  Used to
annotate bench runs on this host, whose vCPUs are periodically stolen
in waves (round-12 finding: identical code measured 161.8-288 s
depending on neighbor demand).
"""
from __future__ import annotations

import sys
import time


def read_stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    steal = vals[7] if len(vals) > 7 else 0
    total = sum(vals[:8])
    return steal, total


def main() -> None:
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    prev_steal, prev_total = read_stat()
    while True:
        time.sleep(interval)
        steal, total = read_stat()
        d_total = max(1, total - prev_total)
        d_steal = steal - prev_steal
        print(
            f"{time.time():.0f} steal={100.0 * d_steal / d_total:.2f}% "
            f"window={interval:.0f}s",
            flush=True,
        )
        prev_steal, prev_total = steal, total


if __name__ == "__main__":
    main()
