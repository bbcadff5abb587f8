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
