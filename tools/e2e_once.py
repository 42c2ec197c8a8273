"""One e2e extraction timing lap (bench.timed_extraction shape) for A/B
runs driven from a shell loop. Prints 'E2E <trials>'.

Usage: python tools/e2e_once.py [cores] [trials]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = bench.ensure_corpus(50000)
    best, times = bench.timed_extraction(cores, path, 50000, trials=trials)
    print(f"E2E {times}")


if __name__ == "__main__":
    main()
