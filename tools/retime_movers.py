"""Adjudicate driver round-over-round "movers" (VERDICT r13 #7).

When the PERF common-set geomean moves >10%, the per-key numbers must be
retimed min-of-N in fresh sessions against BOTH rounds' code before the
move is treated as signal — identical code has measured 18% apart across
days on this shared host (VERDICT r13), so a single-session-per-round
comparison cannot adjudicate an optimization round.

    python tools/retime_movers.py <prev-ref> <reps> key [key ...]

Protocol (the r09 interleaved protocol, automated):
  1. `git worktree add` the previous round's code at <prev-ref> under /tmp.
  2. Copy tools/opt_r14.py into it (the worker imports whatever
     data_service_spark sits next to it, so the copy times the OLD code).
  3. Alternate now-code / prev-code sessions twice each (A B A B); each
     session times every key <reps> times on a warm session (min-of-N,
     bench.py methodology via opt_r14.py `time`).
  4. Report per-key min(now) vs min(prev) across both session pairs; a
     mover is REAL only if the ordering holds in both interleaved rounds.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_side(side_dir: str, reps: int, keys: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(side_dir, "tools", "opt_r14.py"),
         "time", str(reps), *keys],
        cwd=side_dir, capture_output=True, text=True, timeout=3600,
    )
    mins: dict[str, float] = {}
    for line in out.stdout.splitlines():
        m = re.match(r"(\S+): min=([\d.]+) runs=", line)
        if m:
            mins[m.group(1)] = float(m.group(2))
    if not mins:
        sys.stderr.write(out.stderr[-2000:] + "\n")
        raise SystemExit(f"no timings parsed from {side_dir}")
    return mins


def main() -> None:
    prev_ref, reps = sys.argv[1], int(sys.argv[2])
    keys = sys.argv[3:]
    prev_dir = f"/tmp/retime_prev_{prev_ref.replace('/', '_')}"
    if not os.path.isdir(prev_dir):
        subprocess.run(["git", "worktree", "add", "--detach", prev_dir,
                        prev_ref], cwd=REPO, check=True)
    os.makedirs(os.path.join(prev_dir, "tools"), exist_ok=True)
    with open(os.path.join(REPO, "tools", "opt_r14.py")) as fh:
        worker = fh.read()
    with open(os.path.join(prev_dir, "tools", "opt_r14.py"), "w") as fh:
        fh.write(worker)

    results: dict[str, dict[str, list[float]]] = {
        k: {"now": [], "prev": []} for k in keys
    }
    for rnd in range(2):
        for label, side in (("now", REPO), ("prev", prev_dir)):
            mins = _run_side(side, reps, keys)
            for k in keys:
                if k in mins:
                    results[k][label].append(mins[k])
            print(f"[round {rnd}] {label}: " + " ".join(
                f"{k}={mins.get(k, float('nan')):.3f}" for k in keys))

    print("\nper-key adjudication (min across interleaved sessions):")
    for k in keys:
        now_r, prev_r = results[k]["now"], results[k]["prev"]
        if not now_r or not prev_r:
            print(f"  {k}: INCOMPLETE")
            continue
        consistent = all(
            (n > p) == (now_r[0] > prev_r[0])
            for n, p in zip(now_r, prev_r)
        )
        verdict = "REAL" if consistent and abs(
            min(now_r) - min(prev_r)) > 0.1 * max(min(now_r), min(prev_r)) \
            else "NOISE"
        print(f"  {k}: now_min={min(now_r):.3f} prev_min={min(prev_r):.3f} "
              f"sessions now={now_r} prev={prev_r} -> {verdict}")


if __name__ == "__main__":
    main()
