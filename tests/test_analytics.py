"""Funnel-semantics unit tests on a synthetic events fixture.

The oracle differential confirms Spark and DuckDB agree; this test pins
WHAT they agree on — ordering and the conversion window — with
hand-computable cases, so both engines can't drift together.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

_H = 3600 * 1_000_000  # one hour in micros


def _write_events(path: str, rows: list[tuple[int, str, int]]) -> None:
    """rows = (user_id, event_type, ts_micros)."""
    t0 = 1_700_000_000 * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + r[2] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        path,
    )


def test_funnel_ordering_and_conversion_window(spark, tmp_path):
    rows = [
        # user 1: clean view -> click(+1h) -> purchase(+2h): all stages
        (1, "view", 0), (1, "click", 1 * _H), (1, "purchase", 2 * _H),
        # user 2: click BEFORE first view -> fails stage 2 (ordering)
        (2, "click", 0), (2, "view", 1 * _H), (2, "purchase", 2 * _H),
        # user 3: click 25h after view -> outside 24h window
        (3, "view", 0), (3, "click", 25 * _H),
        # user 4: click ok, purchase 26h after click -> fails stage 3
        (4, "view", 0), (4, "click", 1 * _H), (4, "purchase", 27 * _H),
    ]
    _write_events(os.path.join(tmp_path, "events.parquet"), rows)
    got = {
        r.stage: r.n_users
        for r in SPECS["events_funnel"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": 4,
        "click_after_view": 2,  # users 1 and 4
        "purchase_after_click": 1,  # user 1 only
    }
