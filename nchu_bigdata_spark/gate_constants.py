"""Constants shared between the bench recorder (bench.py) and the
end-of-round gate (tools/round_gate.py).

Single source of truth for the bench-noise guard (VERDICT r11 item 6,
ADVICE r12 item 2): bench.py re-records a headline whose spread
breaches this, and round_gate.bench_spread_gate rejects an artifact
whose spread breaches it. A diverged pair of copies would make the
bench silently stop re-recording exactly the artifacts the gate
rejects, so both sides import THIS value.
"""

# value_mean/value (mean-of-reps over best-of-reps, summed) ≈ 1.0 on a
# quiet host; above this the reps were bursty and the record misleads.
SPREAD_MAX = 1.25


def bench_round_artifacts(repo: str) -> list[tuple[int, str]]:
    """(round, path) for every driver-recorded BENCH_r*.json under
    ``repo``, HIGHEST round first — the one shared artifact-discovery
    rule (bench.py's delta baseline and round_gate's spread gate both
    used to carry their own copy of this glob+regex; a drift between
    them would make the gate inspect a different artifact than the
    bench compares against). Stdlib-only: this module must stay
    importable without pyspark (tools/round_gate.py loads it by file
    path in artifact-only environments)."""
    import glob
    import os
    import re

    out = []
    for p in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out, reverse=True)
