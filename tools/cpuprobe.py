#!/usr/bin/env python3
"""Window-quality probe for bench measurements (SURVEY §7.3 r17).

Prints two numbers:
  probe1_sec  — best-of-3 fixed single-thread LCG loop (30M iters).
  probe32_sec — one 32-process pool over 64 x 10M-iter units.

The pair separates the two contention modes this host exhibits:
single-thread speed (flat even in bad windows) vs parallel throughput
(host co-tenancy steals up to ~40% of 32-way scaling with zero guest
load-average signal). Record both next to every committed bench
number; compare parallel efficiency = (64*10e6/probe32) / 32 against
(30e6/probe1) — ~1.0 on an uncontended host.
"""
import time
import multiprocessing as mp


def lcg(iters):
    x = 0
    for _ in range(iters):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def _unit(_):
    return lcg(10_000_000)


def main():
    t1 = min(_timed(lambda: lcg(30_000_000)) for _ in range(3))
    print(f"probe1_sec {t1:.3f}")
    t0 = time.perf_counter()
    with mp.Pool(32) as p:
        p.map(_unit, range(64))
    t32 = time.perf_counter() - t0
    print(f"probe32_sec {t32:.3f}")
    eff = (64 * 10e6 / t32) / 32 / (30e6 / t1)
    print(f"parallel_efficiency {eff:.2f}")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
