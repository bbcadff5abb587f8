"""Hypothesis property test for join_range_partitioned: the grid-cell
decomposition must be invisible — output identical to a brute-force
O(|incidents|x|events|) interval scan on ARBITRARY corpora whose
timestamps cluster at cell and window boundaries (the +-1 us edges the
sf fixtures never happen to hit).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nchu_bigdata_spark.queries.joins import _RP_CELL_US, _RP_WIN_US
from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Timestamps engineered to straddle boundaries: a cell multiple or a
# window length away from one, +-2 us. BASE keeps everything positive.
_BASE = 10 * _RP_CELL_US
_ANCHORS = [0, _RP_CELL_US, 2 * _RP_CELL_US, _RP_WIN_US, _RP_CELL_US + _RP_WIN_US]
_EDGE_US = st.builds(
    lambda a, d: _BASE + a + d,
    st.sampled_from(_ANCHORS),
    st.integers(min_value=-2, max_value=2),
)
_EVENTS = st.lists(
    st.tuples(
        _EDGE_US,
        st.sampled_from(["error", "click", "view"]),
        st.integers(min_value=1, max_value=4),   # user_id
        st.integers(min_value=0, max_value=99),  # whole-dollar value
    ),
    min_size=1,
    max_size=16,
)


@settings(**_SETTINGS)
@given(evs=_EVENTS)
def test_range_partitioned_matches_bruteforce(spark, tmp_path_factory, evs):
    tmp = tmp_path_factory.mktemp("rp")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(evs)), pa.int64()),
                "ts": pa.array(
                    [us for us, *_ in evs], pa.timestamp("us")
                ),
                "user_id": pa.array([u for _, _, u, _ in evs], pa.int64()),
                "event_type": pa.array([t for _, t, _, _ in evs]),
                "value": pa.array([float(v) for *_, v in evs], pa.float64()),
                "props": pa.array(["{}"] * len(evs)),
            }
        ),
        str(tmp / "events.parquet"),
    )
    expect = {}
    for i, (us, t, _, _) in enumerate(evs):
        if t != "error":
            continue
        inside = [
            (u2, v2)
            for us2, _, u2, v2 in evs
            if us <= us2 < us + _RP_WIN_US
        ]
        expect[i] = (
            len(inside),
            len({u for u, _ in inside}),
            sum(v * 100 for _, v in inside),
        )
    got = {
        r.incident_id: (r.n_events, r.n_users, r.sum_cents)
        for r in SPECS["join_range_partitioned"].fn(spark, str(tmp)).collect()
    }
    assert got == expect
