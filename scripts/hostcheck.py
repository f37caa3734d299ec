"""Host-contention probe for bench triage (SCALE.md drift watch).

Burns all cores for ~20s and reports (a) median iterations per
process — an absolute CPU-throughput anchor comparable across runs —
and (b) steal% sampled from /proc/stat while under load. Use when a
bench run flags queries nothing touched: steal >1-2% or a throughput
anchor well below the recorded baselines means the HOST is
contended and timings are not comparable to clean-round numbers.

Recorded anchors (median iters/proc, this VM):
  r11 2026-08-15 21:05 UTC: 77.4M with 3-5% steal (contended evening;
  identical-code bench runs spanned 1.03x-1.21x vs r10 that day)

Since r12, bench.py embeds a 3s version of this probe (steal% +
M iters/sec/proc) before and after its timed passes in the output
line's "h" field — see docs/SCALE.md §Round-12 for the triage rule.
This standalone 20s script remains for ad-hoc host checks.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time


def _burn(_: int) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < 20:
        x += 1
    return x


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = list(map(int, f[1:]))
    return sum(vals), vals[7]  # total, steal


def main() -> None:
    n = os.cpu_count() or 1
    t0, s0 = _cpu_times()
    with mp.Pool(n) as p:
        res = p.map(_burn, range(n))
    t1, s1 = _cpu_times()
    steal_pct = 100.0 * (s1 - s0) / max(1, t1 - t0)
    print(
        f"procs={n} median_iters={sorted(res)[n // 2]} "
        f"steal_pct={steal_pct:.1f}"
    )


if __name__ == "__main__":
    main()
