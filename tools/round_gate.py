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

# Bench-noise guard (VERDICT r11 item 6): rounds 8 and 10/11 published
# contention-inflated headlines. Single source of truth shared with
# bench.py's re-record loop (ADVICE r12 item 2 — a diverged copy here
# silently decouples what the bench re-records from what this gate
# rejects). Loaded by FILE PATH, not package import: the package
# __init__ pulls pyspark, and this tool must keep working (and stay
# cheap) in artifact-only environments.
import importlib.util as _ilu  # noqa: E402

_gc_spec = _ilu.spec_from_file_location(
    "nchu_gate_constants",
    os.path.join(REPO, "nchu_bigdata_spark", "gate_constants.py"),
)
_gc = _ilu.module_from_spec(_gc_spec)
_gc_spec.loader.exec_module(_gc)
SPREAD_MAX = _gc.SPREAD_MAX
bench_round_artifacts = _gc.bench_round_artifacts


def _spread_check_one(path: str) -> dict:
    """Spread-check a single bench artifact file (rc 0 = ok/skip)."""
    try:
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
    except (OSError, ValueError) as e:
        # a corrupt record must not pass
        return {"rc": 1, "file": os.path.basename(path), "err": repr(e)}
    # driver-recorded BENCH_r*.json wraps the payload under "parsed"
    payload = d.get("parsed") or d
    if not isinstance(payload, dict) or "value_mean" not in payload:
        # Pre-r12 artifacts carry no value_mean (and a fresh checkout
        # makes the mtime race among them arbitrary): that's "no spread
        # data", not corruption — skip rather than fail a healthy repo.
        return {
            "rc": 0,
            "file": os.path.basename(path),
            "note": "artifact predates spread recording (no value_mean)",
        }
    try:
        value = float(payload["value"])
        mean = float(payload["value_mean"])
    except (ValueError, KeyError, TypeError) as e:
        return {"rc": 1, "file": os.path.basename(path), "err": repr(e)}
    ratio = round(mean / value, 3) if value else None
    ok = ratio is not None and ratio <= SPREAD_MAX
    out = {
        "rc": 0 if ok else 1,
        "file": os.path.basename(path),
        "value": value,
        "value_mean": mean,
        "spread": ratio,
        "max": SPREAD_MAX,
    }
    if not ok:
        out["note"] = (
            "bench spread exceeds the noise guard - re-record on a "
            "quiet host before publishing this artifact"
        )
    return out


def bench_spread_gate(repo: str) -> dict:
    """Spread-check EVERY artifact the round publishes and fail when
    ANY breaches value_mean/value > SPREAD_MAX (ADVICE r13 item 1: a
    quiet BENCH_LOCAL.json must not shadow a noisy driver-recorded
    BENCH_r*.json — the round ships both, so the gate inspects both).
    Checked set: BENCH_LOCAL.json (the quiet-host re-record, when
    present) AND the highest-numbered BENCH_r*.json (the driver's
    official round record, when present). Pure file read — does NOT
    run the bench (that is the driver's job / a manual quiet-host
    run); this gate stops a noisy record from being one the round
    publishes without anyone noticing."""
    paths = []
    local = os.path.join(repo, "BENCH_LOCAL.json")
    if os.path.exists(local):
        paths.append(local)
    rounds = bench_round_artifacts(repo)
    if rounds:
        paths.append(rounds[0][1])
    if not paths:
        return {"rc": 0, "note": "no bench artifact yet"}
    checks = [_spread_check_one(p) for p in paths]
    worst = max(checks, key=lambda c: c["rc"])
    out = dict(worst)
    out["rc"] = max(c["rc"] for c in checks)
    out["checked"] = checks
    return out


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
    results["bench_spread"] = bench_spread_gate(REPO)
    print(
        f"[gate] bench_spread: rc={results['bench_spread']['rc']} "
        f"(spread={results['bench_spread'].get('spread')})"
    )
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
