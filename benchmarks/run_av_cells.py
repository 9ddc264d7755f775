#!/usr/bin/env python
"""Seed-major cell driver for av_ablation: complete every ARM at seed 0
before spending chip time on seed 1, so a time-boxed run always yields the
visual-marginal comparison (all arms, fewer seeds) instead of many seeds of
one arm.

Each cell runs in its OWN subprocess: the axon client leaks ~35 GB of host
mirrors per cell's resident batches (the OOM killer took a 3-cell
in-process sweep at 130 GB), and a fresh process returns that memory at the
cost of one re-jit (~6 min).  The per-cell cache in av_ablation_cells.json
makes the sweep resumable either way.

Usage: python benchmarks/run_av_cells.py [max_seeds]
"""

import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import av_ablation as ab  # noqa: E402


def main():
    max_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else ab.N_SEEDS
    for seed in range(max_seeds):
        for arm in ab.ARMS:
            if f"{arm}:{seed}" in ab.load_cells():
                print(f"=== {arm}:{seed} (cached) ===", flush=True)
                continue
            subprocess.run(
                [sys.executable, ab.__file__,
                 f"--arm={arm}", f"--seed={seed}"],
                check=True)
            ab.aggregate(ab.load_cells())   # keep the headline JSON current
    ab.aggregate(ab.load_cells())


if __name__ == "__main__":
    main()
