"""End-of-round gate: run the three local verification surfaces and
record their exit codes in one JSON line (committed with the snapshot so
no registry rotation can silently reintroduce a stale-fail window).

Surfaces:
  1. full oracle differential sweep (tools/check_oracle.py, sf0.01)
  2. pytest tests/
  3. plan-shape audit (tools/explain_audit.py)

Usage:
    python tools/round_gate.py            # runs all three, prints JSON
    python tools/round_gate.py --out GATE_STATUS.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = {
    "check_oracle": [
        sys.executable,
        "tools/check_oracle.py",
        os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01"),
    ],
    "pytest": [sys.executable, "-m", "pytest", "tests/", "-q"],
    "explain_audit": [sys.executable, "tools/explain_audit.py"],
}


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if args[:1] == ["--out"]:
        if len(args) < 2:
            print("usage: round_gate.py [--out FILE]", file=sys.stderr)
            return 2
        out_path = args[1]
    results: dict[str, dict] = {}
    for name, cmd in GATES.items():
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True
        )
        # Keep tails of BOTH streams: pytest failures land on stdout,
        # but a crash in a gate tool tracebacks to stderr only.
        tail = proc.stdout.strip().splitlines()[-3:]
        err_tail = proc.stderr.strip().splitlines()[-3:]
        results[name] = {
            "rc": proc.returncode,
            "secs": round(time.time() - t0, 1),
            "tail": tail,
            "err_tail": err_tail,
        }
        print(f"[gate] {name}: rc={proc.returncode} ({results[name]['secs']}s)")
    summary = {
        "green": all(r["rc"] == 0 for r in results.values()),
        "gates": results,
    }
    line = json.dumps(summary)
    print(line)
    if out_path:
        with open(os.path.join(REPO, out_path), "w", encoding="utf-8") as f:
            f.write(line + "\n")
    return 0 if summary["green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
