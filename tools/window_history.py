"""Track which registered queries have held an official CORRECTNESS slot.

The driver checks exactly 50 queries per round (the head of queries_map()).
This tool reads every CORRECTNESS_r*.json in the repo root plus the current
_DRIVER_WINDOW and reports: per-query first-appearance round, the set of
names still never officially checked, and whether the current window keeps
its promise (>= 30 first-time entries after round 4, per VERDICT r4 #1).

Usage: python tools/window_history.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def load_history() -> dict[str, int]:
    """name -> first round with an official CORRECTNESS row."""
    first: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name in json.load(open(path)):
            first.setdefault(name, rnd)
    return first


def main() -> None:
    from trustfuse_ray.pipelines.queries import (_DRIVER_WINDOW,
                                                 _NO_ORACLE_TAIL,
                                                 _all_queries)
    first = load_history()
    registered = list(_all_queries())
    window = list(_DRIVER_WINDOW)
    newly = [n for n in window if n not in first]
    never = [n for n in registered
             if n not in first and n not in window
             and n not in _NO_ORACLE_TAIL]
    print(f"registered queries : {len(registered)}")
    print(f"ever officially checked (r1..): {len(first)}")
    print(f"current window size: {len(window)}")
    print(f"first-time entries in current window: {len(newly)}")
    for n in newly:
        print(f"  NEW  {n}")
    print(f"still never checked (excl. rows-only tail): {len(never)}")
    for n in never:
        print(f"  PENDING  {n}")
    rows_only = [n for n in _NO_ORACLE_TAIL]
    print(f"rows-only tail (documented, never windowed): {rows_only}")


if __name__ == "__main__":
    main()
