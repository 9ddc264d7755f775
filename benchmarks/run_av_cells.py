#!/usr/bin/env python
"""Seed-major cell driver for av_ablation: complete every ARM at seed 0
before spending chip time on seed 1, so a time-boxed run always yields the
visual-marginal comparison (all arms, fewer seeds) instead of many seeds of
one arm.  One process for the whole sweep so the jit compile is paid once.

Usage: python benchmarks/run_av_cells.py [max_seeds]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import av_ablation as ab  # noqa: E402


def main():
    max_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else ab.N_SEEDS
    cells = ab.load_cells()
    for seed in range(max_seeds):
        for arm in ab.ARMS:
            key = f"{arm}:{seed}"
            if key in cells:
                print(f"=== {key} (cached) ===", flush=True)
                continue
            print(f"=== {key} ===", flush=True)
            cells[key] = ab.run_cell(arm, seed)
            ab.save_cells(cells)
            ab.aggregate(cells)   # keep the headline JSON current mid-sweep
    ab.aggregate(cells)


if __name__ == "__main__":
    main()
