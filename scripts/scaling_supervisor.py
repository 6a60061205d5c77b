"""Probe-gated retry supervisor for bench_scaling.py.

This VM's 8-vs-32-process CPU ceiling swings 2.4x-4.05x with co-tenant
load, and sub-ceiling windows produce noise rows — bench_scaling.py
already refuses them. This wrapper automates the retry protocol: poll
the ceiling probe, launch the real bench only inside a window that
clears the gate, and stop after collecting the requested number of
rows or exhausting the time budget. One JSONL line per attempt.

Usage:
    python scripts/scaling_supervisor.py --rows 2 --budget-min 120 \
        [--gate 3.5] [--sleep-s 120]     # env: SCALING_N_DOCS etc. pass through
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2)
    ap.add_argument("--budget-min", type=float, default=120)
    ap.add_argument("--gate", type=float, default=3.5)
    ap.add_argument("--sleep-s", type=float, default=120)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t_end = time.time() + args.budget_min * 60
    collected = 0
    attempt = 0
    # no supervisor-side probe: the child gates itself, and a second
    # probe 40 s earlier just races a flickering window (observed:
    # supervisor 3.65/3.74 → child re-probe 3.0/3.17, window gone)
    while collected < args.rows and time.time() < t_end:
        attempt += 1
        env = dict(os.environ, SCALING_MIN_PROBE=str(args.gate))
        env.setdefault("SCALING_ROUNDS", "1")
        p = subprocess.run(
            [sys.executable, "bench_scaling.py", "--update-baseline"],
            capture_output=True, text=True, cwd=root, env=env,
        )
        line = (p.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            res = {"error": p.stderr[-500:]}
        res["attempt"] = attempt
        print(json.dumps(res), flush=True)
        if res.get("efficiency") is not None:
            collected += 1
        elif time.time() < t_end:
            time.sleep(args.sleep_s)
    print(json.dumps({"done": True, "rows_collected": collected,
                      "attempts": attempt}), flush=True)


if __name__ == "__main__":
    main()
