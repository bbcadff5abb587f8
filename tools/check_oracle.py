"""Local differential checker — mirrors the driver's correctness gate.

Runs every registered query's Spark implementation AND its DuckDB oracle
at a given sf dir and compares row-count + column names + canonicalized
values (full multiset equality — stricter than the driver's hash).

Round-2 change: canonicalization now goes through **pandas on both
sides** (Spark ``toPandas()`` ↔ DuckDB ``.df()``), exactly like the
driver's canonicalizer, instead of ``collect()``/``fetchall()``. Round 1
passed 78/78 locally while 28 queries failed at the driver because the
tuple path represents DECIMAL as ``decimal.Decimal`` on *both* engines,
while the pandas path gets ``Decimal`` objects from Spark but float64
from DuckDB — representation drift the old checker could not see. The
pandas path also crashes on list-valued columns during sort, just like
the driver, so collection outputs are caught locally too. Rows-only
queries (no oracle) are still canonicalized on the Spark side because
the driver does the same even without an oracle.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from nchu_bigdata_spark.io import TABLES
from nchu_bigdata_spark.registry import ordered_specs
from nchu_bigdata_spark.session import get_session


def canon(v):
    """Canonical, engine-independent string form of one value.

    Deliberately type-tagged: ``Decimal('1.5')`` and ``1.5`` canonicalize
    differently, because the driver's hash distinguishes them too.
    """
    if v is None:
        return "∅"
    if isinstance(v, Decimal):
        return f"dec:{v.normalize():f}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "∅"
        return f"f:{float(v)!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "∅"
        # DuckDB's .df() renders DATE as a midnight Timestamp while
        # Spark's toPandas keeps datetime.date; the driver hashes these
        # equal (fn_date passed round 1), so canonicalize midnight
        # timestamps as dates.
        if v.tz is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return f"d:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0) and v.tzinfo is None:
            return f"d:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if v is pd.NaT:
        return "∅"
    return f"s:{v}"


def canon_pdf(pdf: pd.DataFrame) -> list[str]:
    """Driver-style canonicalization: order columns by name, sort rows
    with pandas ``sort_values`` (this is what crashes on list columns —
    intentionally not caught), then render each row."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return sorted(
        "|".join(canon(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def compare(
    name: str, spark, con, sf_dir: str, spec
) -> tuple[bool, str, pd.DataFrame]:
    """Returns (ok, msg, spark_pdf) — the Spark-side pandas frame rides
    along so BOUNDED_CHECKS replays reuse it instead of re-executing the
    full Spark query (ADVICE r10: the replay was doubling Spark work for
    every graduated multimodal id on every sweep)."""
    spdf = spec.fn(spark, sf_dir).toPandas()
    res = con.execute(spec.oracle)
    opdf = res.df()
    if sorted(spdf.columns) != sorted(opdf.columns):
        return False, (
            f"columns differ: spark={sorted(spdf.columns)} "
            f"oracle={sorted(opdf.columns)}"
        ), spdf
    if len(spdf) != len(opdf):
        return (
            False,
            f"row count differs: spark={len(spdf)} oracle={len(opdf)}",
            spdf,
        )
    cs, co = canon_pdf(spdf), canon_pdf(opdf)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}", spdf
    return True, f"{len(spdf)} rows", spdf


def exact_compression_ratio(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """text_compression_ratio: a DEFLATE encoder is not SQL-expressible,
    but the checker is Python — replay zlib(level 6) over the same
    UTF-8 bytes (documents fetched via DuckDB) and demand EXACT
    equality of every output row. Harder than a bounded check; only
    the transport differs from a real oracle."""
    import zlib

    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    expect = {}
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        comp_len = len(zlib.compress(raw, 6))
        ratio_bp = comp_len * 10_000 // max(len(raw), 1)
        expect[int(doc_id)] = (
            len(raw),
            comp_len,
            ratio_bp,
            comp_len * 100 < 35 * len(raw),
        )
    got = {
        int(r["doc_id"]): (
            int(r["raw_len"]),
            int(r["comp_len"]),
            int(r["ratio_bp"]),
            bool(r["flag_boilerplate"]),
        )
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"zlib replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact zlib replay"


def _replay_phashes(con) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_bytes, phash): the aHash SPEC replayed in pure
    Python — independent of numpy AND of the module's BMP encode/parse
    (the pixel tiling is reconstructed straight from the payload
    definition). Shared by the phash and phash-pairs checks."""
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        data = text.encode("utf-8") or b"\x00"
        row_px = 16 * 3
        n_rows = max(1, len(data) // row_px)
        need = n_rows * row_px
        px = (data * (need // len(data) + 1))[:need]
        gray = [
            [
                px[r * row_px + c * 3]
                + px[r * row_px + c * 3 + 1]
                + px[r * row_px + c * 3 + 2]
                for c in range(16)
            ]
            for r in range(n_rows)
        ]
        h, w = n_rows, 16
        cells = [[0] * 8 for _ in range(8)]
        for i in range(8):
            r0, r1 = i * h // 8, max((i + 1) * h // 8, i * h // 8 + 1)
            for j in range(8):
                c0, c1 = j * w // 8, max((j + 1) * w // 8, j * w // 8 + 1)
                vals = [gray[r][c] for r in range(r0, r1) for c in range(c0, c1)]
                cells[i][j] = sum(vals) // len(vals)
        thr = sum(sum(row) for row in cells) // 64
        v = 0
        for i in range(8):
            for j in range(8):
                if cells[i][j] > thr:
                    v |= 1 << (8 * i + j)
        if v & (1 << 63):
            v -= 1 << 64
        expect[int(doc_id)] = (len(text.encode("utf-8")), v)
    return expect


def exact_multimodal_phash(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_phash: exact per-row equality vs the spec replay."""
    expect = _replay_phashes(con)
    got = {
        int(r["doc_id"]): (int(r["n_bytes"]), int(r["phash"]))
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"aHash spec replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact aHash spec replay"


def exact_multimodal_phash_pairs(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_phash_pairs: brute-force replay of the operator's
    DEFINITION — pairs sharing ≥1 of the 4×16-bit bands with exact
    hamming ≤ 6 — over the spec-replayed hashes. O(n²) in Python is
    fine at check scale and fully independent of the join machinery."""
    hashes = {k: v for k, (_n, v) in _replay_phashes(con).items()}
    ids = sorted(hashes)
    M = (1 << 64) - 1
    expect = {}
    for i, a in enumerate(ids):
        ha = hashes[a] & M
        for b in ids[i + 1 :]:
            hb = hashes[b] & M
            nb = sum(
                1
                for s in range(4)
                if (ha >> (16 * s)) & 0xFFFF == (hb >> (16 * s)) & 0xFFFF
            )
            if nb == 0:
                continue
            ham = bin(ha ^ hb).count("1")
            if ham <= 6:
                expect[(a, b)] = (ham, nb)
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): (int(r["hamming"]), int(r["n_bands"]))
        for _, r in spdf.iterrows()
    }
    if got != expect:
        miss = [k for k in expect if k not in got][:3]
        extra = [k for k in got if k not in expect][:3]
        return False, f"pair replay mismatch: missing {miss}, extra {extra}"
    return True, f"{len(got)} pairs, exact band+hamming replay"


def exact_multimodal_audio_stats(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_audio_stats: the synth→decode→stats chain replayed in
    pure Python from the sample SPEC (each UTF-8 byte b becomes the
    int16 sample (b − 128) << 8; operators/multimodal.py encode_wav) —
    independent of numpy, wave, and the module's codec code."""
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        data = text.encode("utf-8") or b"\x80"
        s = [(b - 128) * 256 for b in data]
        zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
        expect[doc_id] = (
            len(s),
            max(abs(x) for x in s),
            sum(s),
            sum(x * x for x in s),
            zc,
        )
    got = {
        int(r["doc_id"]): (
            int(r["n_samples"]),
            int(r["peak_abs"]),
            int(r["sum_samples"]),
            int(r["energy"]),
            int(r["zero_crossings"]),
        )
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"PCM stats spec replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact PCM stats spec replay"


def exact_multimodal_phash_clusters(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_phash_clusters: union-find over the spec-replayed
    band+hamming pair graph (the exact_multimodal_phash_pairs replay,
    extended with transitive closure) — labels, sizes, and canonical
    flags all recomputed independently of the Spark CC machinery."""
    hashes = {k: v for k, (_n, v) in _replay_phashes(con).items()}
    ids = sorted(hashes)
    M = (1 << 64) - 1
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        ha = hashes[a] & M
        for b in ids[i + 1 :]:
            hb = hashes[b] & M
            if not any(
                (ha >> (16 * s_)) & 0xFFFF == (hb >> (16 * s_)) & 0xFFFF
                for s_ in range(4)
            ):
                continue
            if bin(ha ^ hb).count("1") <= 6:
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    expect = {}
    for root, members in comp.items():
        lbl = min(members)
        for m in members:
            expect[m] = (lbl, len(members), int(m == lbl))
    got = {
        int(r["doc_id"]): (
            int(r["cluster_id"]), int(r["cluster_size"]), int(r["is_canonical"])
        )
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"CC replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact union-find replay"


def exact_multimodal_audio_vad(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_audio_vad: synth→decode→frame→gate→run-length chain
    replayed in pure Python from the sample spec ((b − 128) << 8,
    64-sample frames, active iff e·n_frames > total) — independent of
    numpy and the operator's codec code."""
    FRAME = 64
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        data = text.encode("utf-8") or b"\x80"
        s = [(b - 128) * 256 for b in data]
        nf = (len(s) + FRAME - 1) // FRAME
        fe = [
            sum(x * x for x in s[i * FRAME:(i + 1) * FRAME])
            for i in range(nf)
        ]
        tot = sum(fe)
        act = [e * nf > tot for e in fe]
        n_seg = longest = run = 0
        for a in act:
            if a:
                run += 1
                n_seg += run == 1
                longest = max(longest, run)
            else:
                run = 0
        expect[doc_id] = (
            len(s), nf, sum(act), n_seg, longest,
            sum(act) * 10_000 // nf if nf else 0,
        )
    got = {
        int(r["doc_id"]): (
            int(r["n_samples"]), int(r["n_frames"]), int(r["n_active"]),
            int(r["n_segments"]), int(r["longest_run"]),
            int(r["active_bp"]),
        )
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"VAD spec replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact VAD spec replay"


def exact_multimodal_image_stats(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_image_stats: the pixel spec replayed in pure Python
    straight from the payload definition (the _replay_phashes tiling:
    16px-wide rows of 3 bytes each, truncated to whole rows) —
    independent of numpy and the module's BMP codec."""
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        data = text.encode("utf-8") or b"\x00"
        row_px = 16 * 3
        n_rows = max(1, len(data) // row_px)
        need = n_rows * row_px
        px = (data * (need // len(data) + 1))[:need]
        luma = [
            px[r * row_px + c * 3]
            + px[r * row_px + c * 3 + 1]
            + px[r * row_px + c * 3 + 2]
            for r in range(n_rows)
            for c in range(16)
        ]
        expect[doc_id] = (
            16 * n_rows, 16, n_rows,
            min(luma), max(luma), sum(luma), max(luma) - min(luma),
        )
    got = {
        int(r["doc_id"]): (
            int(r["n_pixels"]), int(r["width"]), int(r["height"]),
            int(r["min_luma3"]), int(r["max_luma3"]),
            int(r["sum_luma3"]), int(r["contrast3"]),
        )
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"luma spec replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact luma spec replay"


def exact_multimodal_scene_changes(con, spdf: pd.DataFrame) -> tuple[bool, str]:
    """multimodal_scene_changes: frame/delta/gate spec replayed in pure
    Python (128B frames every 256B, zero-padded; L1 byte deltas; cut
    iff d*n > total) — independent of numpy and the operator code."""
    FL, FS = 128, 256
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        data = text.encode("utf-8")
        frames = []
        for off in range(0, max(len(data), 1), FS):
            fr = data[off:off + FL]
            frames.append(fr + b"\x00" * (FL - len(fr)))
        deltas = [
            sum(abs(a - b) for a, b in zip(frames[i], frames[i + 1]))
            for i in range(len(frames) - 1)
        ]
        nd, tot = len(deltas), sum(deltas)
        cuts = sum(1 for d in deltas if d * nd > tot)
        expect[doc_id] = (
            len(frames), nd, cuts, max(deltas) if deltas else 0, tot,
        )
    got = {
        int(r["doc_id"]): (
            int(r["n_frames"]), int(r["n_deltas"]), int(r["n_cuts"]),
            int(r["max_delta"]), int(r["sum_delta"]),
        )
        for _, r in spdf.iterrows()
    }
    if got != expect:
        bad = [k for k in expect if got.get(k) != expect[k]][:3]
        return False, f"scene spec replay mismatch, e.g. doc_ids {bad}"
    return True, f"{len(got)} rows, exact scene spec replay"


# Rows-only queries with a promoted bounded accuracy check: the sweep
# runs these against DuckDB exact aggregates instead of recording a
# bare rows-only line.
BOUNDED_CHECKS = {
    # agg_approx (r7) and agg_sketch_merge (r8) graduated out of here:
    # their outputs are now deterministic bounded VERDICTS with a real
    # spec.oracle, so the driver's exact-hash comparison certifies them.
    # The three checks below are EXACT Python replays (zlib / aHash
    # spec) - stronger than the driver hash; they stay here because a
    # DEFLATE encoder / byte-level image tiling is genuinely not
    # SQL-expressible, the one case the driver contract sanctions as
    # rows-only.
    "text_compression_ratio": exact_compression_ratio,
    "multimodal_phash": exact_multimodal_phash,
    "multimodal_phash_pairs": exact_multimodal_phash_pairs,
    "multimodal_audio_stats": exact_multimodal_audio_stats,
    "multimodal_phash_clusters": exact_multimodal_phash_clusters,
    "multimodal_audio_vad": exact_multimodal_audio_vad,
    "multimodal_image_stats": exact_multimodal_image_stats,
    "multimodal_scene_changes": exact_multimodal_scene_changes,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = ordered_specs()
    spark = get_session("oracle-check")
    con = duckdb.connect()
    # Pin the oracle session TZ: DuckDB reads events.ts as TIMESTAMPTZ and
    # date_trunc's in its session TimeZone (host-local by default), while
    # the Spark side pins UTC. Without this, events_retention/sub_recursive
    # report false divergences on any non-UTC host.
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failed, skipped = [], []
    ran = 0  # queries actually executed — the summary denominator must
    # count these, not len(specs): under `--only`-style filtering a
    # 3-query spot run used to print "372 ok" (VERDICT r10 item 4).
    for name, spec in specs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        if spec.oracle is None:
            # rows-only: the driver still canonicalizes the Spark side,
            # so run the same pandas canon to catch unsortable outputs.
            # Queries in BOUNDED_CHECKS additionally have their
            # documented accuracy bounds certified against DuckDB exact
            # aggregates (promoted from pytest, VERDICT r5 item 6).
            try:
                pdf = spec.fn(spark, sf_dir).toPandas()
                canon_pdf(pdf)
                bounded = BOUNDED_CHECKS.get(name)
                if bounded is not None:
                    ok, msg = bounded(con, pdf)
                    status = "OK" if ok else "FAIL"
                    print(
                        f"  {status} {name}: bounded-check {msg} "
                        f"({time.time()-t0:.1f}s)"
                    )
                    if not ok:
                        failed.append(name)
                else:
                    print(
                        f"  ROWS-ONLY {name}: {len(pdf)} rows "
                        f"({time.time()-t0:.1f}s)"
                    )
                    skipped.append(name)
            except Exception as e:  # noqa: BLE001
                print(
                    f"  FAIL {name}: rows-only canon crash: "
                    f"{type(e).__name__}: {e} ({time.time()-t0:.1f}s)"
                )
                failed.append(name)
            continue
        try:
            ok, msg, spdf = compare(name, spark, con, sf_dir, spec)
        except Exception as e:  # noqa: BLE001
            ok, msg, spdf = False, f"EXCEPTION: {type(e).__name__}: {e}", None
        # r10 (VERDICT r9 item 6): queries that graduated from
        # rows-only to a full SQL oracle KEEP their independent
        # pure-Python spec replay — the oracle certifies for the
        # driver, the replay guards against a shared misreading of
        # the spec by both engines' SQL (unweakened, additive). The
        # replay reuses compare()'s Spark-side frame (no re-execution).
        if ok and name in BOUNDED_CHECKS:
            try:
                rok, rmsg = BOUNDED_CHECKS[name](con, spdf)
                ok, msg = rok, f"{msg}; replay: {rmsg}"
            except Exception as e:  # noqa: BLE001
                ok, msg = False, f"replay EXCEPTION: {type(e).__name__}: {e}"
        status = "OK" if ok else "FAIL"
        print(f"  {status} {name}: {msg} ({time.time()-t0:.1f}s)")
        if not ok:
            failed.append(name)
    print(
        f"\n{ran - len(failed) - len(skipped)} ok, "
        f"{len(failed)} failed, {len(skipped)} rows-only"
        + ("" if ran == len(specs) else f"  [partial run: {ran}/{len(specs)}]")
    )
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
