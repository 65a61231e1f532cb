"""Sample /proc/stat hypervisor steal every N seconds — the r11 finding:
same-tree bench walls swing 1.8x with host steal bursts, so every closing
measurement window must be steal-qualified. Prints one line per sample:
`<epoch> <steal_pct_since_last>`; run alongside a bench and average.

Usage: python tools/steal_sampler.py [interval_sec] > /tmp/steal.log &
"""

from __future__ import annotations

import sys
import time


def read_stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    total = sum(vals)
    steal = vals[7] if len(vals) > 7 else 0
    return total, steal


def main() -> None:
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    pt, ps = read_stat()
    while True:
        time.sleep(interval)
        t, s = read_stat()
        dt, ds = t - pt, s - ps
        pct = 100.0 * ds / dt if dt else 0.0
        print(f"{time.time():.1f} {pct:.3f}", flush=True)
        pt, ps = t, s


if __name__ == "__main__":
    main()
