"""Round-13 births and hardening.

`scan_mor_positional` gets BOTH a pure-Python ordinal replay (the
oracle and the engine could share a misreading of "position"; a
literal sorted-list walk can't) and a plan-shape pin (ONE left-anti
join applies the delete file; no Cartesian anywhere).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()


def _bucket(orderkey) -> int:
    return int(hashlib.md5(str(orderkey).encode()).hexdigest()[:8], 16) % 4


# --------------------------------------------------------------------------
# scan_mor_positional
# --------------------------------------------------------------------------


def test_mor_positional_replay(spark, sf_dir, duck):
    """Literal replay of the position-delete contract: sort each
    bucket's rows by o_orderkey (the writer's in-file order), delete
    ordinals 2, 9, 16, ..., aggregate survivors."""
    per_bucket: dict[int, list] = defaultdict(list)
    for ok, st, tp in duck.execute(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
    ).fetchall():
        per_bucket[_bucket(ok)].append((ok, st, tp))
    want = {}
    n_deleted = 0
    for b, rows in per_bucket.items():
        rows.sort()
        live = [r for pos, r in enumerate(rows) if pos % 7 != 2]
        n_deleted += len(rows) - len(live)
        want[b] = (len(live), sum(tp for _, _, tp in live))
    got_rows = SPECS["scan_mor_positional"].fn(spark, sf_dir).collect()
    got = {r.bucket: (r.n_live, float(r.sum_price)) for r in got_rows}
    assert set(got) == set(want)
    for b, (n, sp) in want.items():
        assert got[b][0] == n, f"bucket {b}"
        assert abs(got[b][1] - sp) < 1e-3, f"bucket {b}"
    # the in-result invariant column: no deleted ordinal survived
    assert all(r.all_live_kept for r in got_rows)
    # deletes genuinely removed ~1/7 of every bucket
    n_orders = sum(len(v) for v in per_bucket.values())
    assert 0 < n_deleted < n_orders // 5
    assert sum(n for n, _ in got.values()) == n_orders - n_deleted


def test_mor_positional_plan(spark, sf_dir):
    """Plan pin: the deletes apply through exactly ONE left-anti join
    keyed on the physical row ordinal (_metadata.row_index), and
    nothing degenerates to a Cartesian product."""
    df = SPECS["scan_mor_positional"].fn(spark, sf_dir)
    df.collect()  # finalize AQE so the executed plan is the real one
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString carries the Initial Plan below the Final Plan —
    # pin the shape of what actually ran
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"LeftAnti", plan)) == 1, plan
    assert "CartesianProduct" not in plan
    assert "row_index" in plan, "deletes must key on the file ordinal"
    # the delete file is the BUILD side (delete-file cardinality, not
    # base cardinality, sets the hash table) and the base scan reaches
    # the join without an exchange
    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight", plan), plan


# --------------------------------------------------------------------------
# embed_isotropy
# --------------------------------------------------------------------------


def _iso_replay(qvecs, d):
    """Exact participation-ratio replay with Python bigints: S = sum of
    x x^T over the quantized vectors, PR = 1e6*tr(S)^2 // ||S||_F^2."""
    S = [[0] * d for _ in range(d)]
    for v in qvecs:
        for i in range(d):
            for j in range(i, d):
                S[i][j] += v[i] * v[j]
    tr = sum(S[i][i] for i in range(d))
    fro2 = sum(
        S[i][j] * S[i][j] if i == j else 2 * S[i][j] * S[i][j]
        for i in range(d)
        for j in range(i, d)
    )
    return (
        tr,
        (10**6 * tr * tr) // fro2,
        (10**6 * tr * tr) // (d * fro2),
    )


def test_embed_isotropy_exact_replay(spark, tmp_path):
    import random
    import struct as _struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(13)
    d, nvec = 6, 60
    # label 0: isotropic-ish noise; label 1: mass collapsed onto one
    # axis (plus tiny noise) -> its PR must be far lower
    vecs, labels = [], []
    for k in range(nvec):
        if k % 2 == 0:
            vecs.append([rng.uniform(-1, 1) for _ in range(d)])
            labels.append(0)
        else:
            v = [rng.uniform(-0.01, 0.01) for _ in range(d)]
            v[0] = rng.choice([-1.0, 1.0]) * rng.uniform(0.9, 1.1)
            vecs.append(v)
            labels.append(1)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(nvec), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int64()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = SPECS["embed_isotropy"].fn(spark, str(tmp_path)).collect()
    got = {r.label: (r.n_vecs, r.d, r.trace_q, r.pr_ppm, r.iso_ppm) for r in rows}
    assert set(got) == {-1, 0, 1}

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    q = [[int(round(f32(x) * 1_000)) for x in v] for v in vecs]  # noqa: RUF046
    groups = {
        -1: q,
        0: [v for v, l in zip(q, labels) if l == 0],
        1: [v for v, l in zip(q, labels) if l == 1],
    }
    for lbl, qs in groups.items():
        tr, pr, iso = _iso_replay(qs, d)
        n, gd, gtr, gpr, giso = got[lbl]
        assert n == len(qs)
        assert gd == d
        assert gtr == tr, lbl
        assert gpr == pr, lbl          # exact bigint quotient parity
        assert giso == iso, lbl
        # PR in [1, d], iso in (0, 1]
        assert 10**6 <= gpr <= d * 10**6
        assert 0 < giso <= 10**6
    # the collapsed label is measurably less isotropic
    assert got[1][4] < got[0][4] // 2


# --------------------------------------------------------------------------
# scan_zorder_pruned
# --------------------------------------------------------------------------


def test_zorder_pruned_pushdown_and_envelopes(spark, sf_dir):
    """(a) The box predicates reach the parquet scan as pushed literal
    range filters on BOTH dimensions; (b) the quantitative zone-map
    claim: under the z-ordered layout the box's file-envelope
    intersection count is a small fraction of what a custkey-sorted
    (linear) layout yields for the same box."""
    from pyspark.sql import functions as F

    from nchu_bigdata_spark.queries.relational import scratch_dir
    from nchu_bigdata_spark.queries.scale import (
        _ZP_CK_HI,
        _ZP_CK_LO,
        _ZP_DAY_HI,
        _ZP_DAY_LO,
        _ZP_FILES,
    )

    # plan toString elides long fields at maxMetadataStringLength
    # (default 100) — the PushedFilters list is longer than that
    prev_len = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = SPECS["scan_zorder_pruned"].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev_len)
    plan = plan.split("== Initial Plan ==")[0]
    assert "PushedFilters" in plan
    for col in ("o_custkey", "o_day"):
        assert f"GreaterThanOrEqual({col}" in plan, plan
        assert f"LessThanOrEqual({col}" in plan, plan

    def n_box_files(frame):
        env = (
            frame.groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("o_day").alias("dlo"),
                F.max("o_day").alias("dhi"),
                F.min("o_custkey").alias("clo"),
                F.max("o_custkey").alias("chi"),
            )
            .collect()
        )
        hit = sum(
            1
            for r in env
            if r.dlo <= _ZP_DAY_HI - 1
            and r.dhi >= _ZP_DAY_LO
            and r.clo <= _ZP_CK_HI
            and r.chi >= _ZP_CK_LO
        )
        return hit, len(env)

    zdir = scratch_dir(sf_dir, "orders_zorder")
    z_hit, z_files = n_box_files(spark.read.parquet(zdir))
    assert z_files == _ZP_FILES

    # linear baseline: same columns, same file count, sorted by the
    # custkey dimension only — the date box then intersects (nearly)
    # every file
    lin_dir = scratch_dir(sf_dir, "orders_zorder_linear_baseline")
    (
        spark.read.parquet(zdir)
        .repartitionByRange(_ZP_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lin_dir)
    )
    l_hit, l_files = n_box_files(spark.read.parquet(lin_dir))
    assert l_files == _ZP_FILES
    # the box must hit strictly fewer z-ordered files — and by a wide
    # margin (the 1994-H1 window is ~7% of the day domain, so the
    # day-axis envelope alone eliminates most z-range files)
    assert z_hit * 2 <= l_hit, (z_hit, l_hit)
    assert z_hit <= z_files // 2, (z_hit, z_files)


# --------------------------------------------------------------------------
# udtf_map_in_arrow
# --------------------------------------------------------------------------


def test_map_in_arrow_plan_and_non_ascii(spark, tmp_path, duck, sf_dir):
    """(a) Plan: the Arrow map runs partition-preserving — no exchange
    below the MapInArrow node (the only shuffle is the rollup's);
    (b) non-ASCII props: utf8_length counts CHARACTERS, so the engine
    matches SQL LENGTH on a corpus where bytes != chars."""
    import re

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = SPECS["udtf_map_in_arrow"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
    # nothing between the scan and the Arrow map shuffles: the single
    # Exchange in the final plan belongs to the event_type rollup
    assert len(re.findall(r"Exchange ", plan)) == 1, plan

    # non-ASCII fixture through the real operator (table() normalizes
    # the int64-nanos ts like the parity-test writer)
    t0 = 1_755_000_000 * 1_000_000_000
    rows = [
        (1, t0, 1, "click", 1.005, '{"q":"café"}'),
        (2, t0 + 1, 1, "view", -2.5, '{"q":"日本語テスト"}'),
        (3, t0 + 2, 2, "click", 0.115, '{"plain":"ascii"}'),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {
        r.event_type: (r.n, r.sum_cents, r.sum_props_len)
        for r in SPECS["udtf_map_in_arrow"].fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * EXCLUDE (ts), "
        f"make_timestamp(ts // 1000) AS ts FROM "
        f"'{tmp_path}/events.parquet'"
    )
    want = {
        t: (n, c, p)
        for t, n, c, p in con.execute(
            SPECS["udtf_map_in_arrow"].oracle
        ).fetchall()
    }
    assert got == want
    # the char-count semantics specifically: the café row is 12 chars
    # (13 bytes), the Japanese row 14 chars (26 bytes) — byte counting
    # would inflate both
    assert got["click"][2] == 12 + 17
    assert got["view"][2] == 14


# --------------------------------------------------------------------------
# stream_range_join — cell-boundary semantics
# --------------------------------------------------------------------------


def test_stream_range_join_cell_boundaries(spark, tmp_path):
    """Adversarial fixture pinned to the exact grid edges: events AT
    the window open (included), one microsecond before close
    (included), AT close (excluded), straddling a 128 s cell boundary
    (must still match — the interval's second exploded cell carries
    it), and in a far cell (no match). Batch form; the parity test
    already proves stream==batch on the corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nchu_bigdata_spark.queries.joins import _RP_CELL_US, _RP_WIN_US

    cell_ns = _RP_CELL_US * 1000
    win_ns = _RP_WIN_US * 1000
    # place the error 5 s before a cell boundary so its 120 s window
    # crosses into the next cell
    t_err = 10 * cell_ns - 5_000_000_000
    rows = [
        # (event_id, ts_ns, event_type)
        (1, t_err, "error"),            # opens the window; also inside it
        (2, t_err, "view"),             # exactly at lo -> included
        (3, t_err + win_ns - 1000, "view"),  # lo + win - 1us -> included
        (4, t_err + win_ns, "view"),    # exactly at hi -> EXCLUDED
        (5, 10 * cell_ns + 1000, "view"),  # next cell, inside window
        (6, 12 * cell_ns, "view"),      # far cell -> no match
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = sorted(
        (r.incident_id, r.event_id)
        for r in SPECS["stream_range_join"].fn(spark, str(tmp_path)).collect()
    )
    # window [lo, lo+120s): events 1 (itself), 2, 3, 5; NOT 4 (== hi),
    # NOT 6 (far); and no pair is emitted twice despite the interval
    # spanning two cells
    assert got == [(1, 1), (1, 2), (1, 3), (1, 5)], got


# --------------------------------------------------------------------------
# scan_mor_positional — tiny-bucket edge (no deletable ordinals)
# --------------------------------------------------------------------------


def test_mor_positional_tiny_buckets(spark, tmp_path):
    """Buckets with <= 2 rows have no ordinal >= 2 to delete: the
    sequence guard must emit an empty delete set (not raise on an
    empty sequence range) and every row survives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 6 orderkeys spread across md5 buckets; every bucket ends up tiny
    keys = list(range(1, 7))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(keys)),
                "o_totalprice": pa.array([10.0 * k for k in keys], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = SPECS["scan_mor_positional"].fn(spark, str(tmp_path)).collect()
    per_bucket = defaultdict(int)
    for k in keys:
        per_bucket[_bucket(k)] += 1
    # replay: a bucket of n rows loses ordinals {2, 9, ...} < n
    want_live = sum(n - len(range(2, n, 7)) for n in per_bucket.values())
    assert sum(r.n_live for r in rows) == want_live
    assert all(r.all_live_kept for r in rows)


# --------------------------------------------------------------------------
# agg_hll_portable — exact pure-Python replay
# --------------------------------------------------------------------------


def test_hll_portable_exact_replay(spark, sf_dir, duck):
    """Replay the whole sketch with Python bigints: salted md5 60-bit
    hash, low-8-bit bucket, leading-zero rank, register MAX over the
    full 256 spine, dyadic sum, one integer division. Every output
    column must match exactly (the estimator itself is deterministic,
    not just close)."""
    from nchu_bigdata_spark.queries.aggregates import (
        _HLL_ALPHA_DEN,
        _HLL_ALPHA_NUM,
        _HLL_B,
        _HLL_M,
        _HLL_R,
    )

    want = {}
    groups = defaultdict(set)
    for et, uid in duck.execute(
        "SELECT event_type, user_id FROM events"
    ).fetchall():
        groups[et].add(uid)
    for et, uids in groups.items():
        regs = [0] * _HLL_M
        for uid in uids:
            hv = int(
                hashlib.md5(f"{et}:{uid}".encode()).hexdigest()[:15], 16
            )
            b = hv % _HLL_M
            w = hv // _HLL_M
            rank = (_HLL_R - _HLL_B) + 1 - (w.bit_length())
            regs[b] = max(regs[b], rank)
        s2 = sum(1 << (_HLL_R - m) for m in regs)
        est = (_HLL_ALPHA_NUM * _HLL_M * _HLL_M * (1 << _HLL_R)) // (
            _HLL_ALPHA_DEN * s2
        )
        v = sum(1 for m in regs if m == 0)
        n = len(uids)
        want[et] = (
            n,
            est,
            abs(est - n) * 10000 // n,
            v,
            v > 0 and est * 2 < 5 * _HLL_M,
        )
    got = {
        r.event_type: (r.n_exact, r.hll_est, r.err_bp, r.v_empty, r.lc_regime)
        for r in SPECS["agg_hll_portable"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # registers must merge by MAX: the estimate never undercounts by
    # more than the sketch's design error in the raw regime; at tiny
    # corpora lc_regime must be flagged
    for et, (n, est, _, v, lc) in want.items():
        if n < 100:
            assert lc, f"{et}: small range must flag lc_regime"


def test_hll_portable_merge_property(duck):
    """THE property that makes HLL a 100 TB structure: per-shard
    register sets merged by element-wise MAX must equal the
    single-pass registers EXACTLY (integer equality), so the merged
    estimate is the single-pass estimate — partial aggregation loses
    nothing. Replayed shard-by-shard in pure Python over a month
    sharding the engine never saw."""
    from nchu_bigdata_spark.queries.aggregates import (
        _HLL_B,
        _HLL_M,
        _HLL_R,
    )

    def registers(pairs):
        regs = [0] * _HLL_M
        for et, uid in pairs:
            hv = int(
                hashlib.md5(f"{et}:{uid}".encode()).hexdigest()[:15], 16
            )
            b = hv % _HLL_M
            rank = (_HLL_R - _HLL_B) + 1 - (hv // _HLL_M).bit_length()
            regs[b] = max(regs[b], rank)
        return regs

    rows = duck.execute(
        "SELECT event_type, user_id, epoch_us(ts) // 86400000000"
        " FROM events WHERE event_type = 'click'"
    ).fetchall()
    assert rows
    single = registers([(et, uid) for et, uid, _ in rows])
    shards = defaultdict(list)
    for et, uid, day in rows:
        shards[day].append((et, uid))
    assert len(shards) > 1, "need multiple shards for a real merge"
    merged = [0] * _HLL_M
    for pairs in shards.values():
        for j, m in enumerate(registers(pairs)):
            merged[j] = max(merged[j], m)
    assert merged == single
