#!/usr/bin/env python3
"""Is the host calm enough to record a benchmark artifact?

The VM suffers episodic hypervisor CPU-steal throttling (cumulative steal
~4x user time; one throttled full-suite run recorded 899.6 s vs 110 s for
identical code — see BENCH_throttled_host.json). Artifacts recorded during
a throttled phase are honest but useless for round-over-round comparison,
so: sample /proc/stat steal share over a window and gate on it.

Usage: python3 tools/host_calm.py [window_sec] [max_steal_pct]
Exits 0 (and prints the measured share) when calm, 1 when throttled.
"""
import sys, time


def cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7]  # total jiffies, steal jiffies


def main():
    window = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    limit = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    t0, s0 = cpu_times()
    time.sleep(window)
    t1, s1 = cpu_times()
    share = 100.0 * (s1 - s0) / max(1, t1 - t0)
    calm = share <= limit
    print(f"steal {share:.2f}% over {window:.0f}s "
          f"({'CALM' if calm else 'THROTTLED'}, limit {limit}%)")
    sys.exit(0 if calm else 1)


if __name__ == "__main__":
    main()
