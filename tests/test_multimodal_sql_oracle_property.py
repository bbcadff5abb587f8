"""Property tests for the round-10 multimodal SQL oracles.

The DuckDB oracles for the decode family replay closed-form byte specs
over ``documents.text``. The committed fixtures only contain ASCII
texts of length 48-553, so two spec arms never fire there: the
tile-when-short pixel path (len < 48) and degenerate frame counts.
These tests run the REGISTERED oracle SQL (pulled from the registry,
not a copy) against adversarial in-memory corpora and compare with an
independent pure-Python replay of each spec — no Spark session needed,
so the whole file is fast.

Also pins the ASCII assumption the oracles rely on (char position ==
byte position): if the testdata generator ever emits non-ASCII text,
test_fixture_texts_are_ascii fails before a driver hash mismatch does.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from nchu_bigdata_spark.registry import load_all_queries

# adversarial lengths: tiling arm (<48), row boundaries, frame
# boundaries (128/256), plus a seeded random spread
_EDGE_LENGTHS = [1, 2, 3, 4, 47, 48, 49, 95, 96, 97, 127, 128, 129,
                 255, 256, 257, 383, 384, 511, 512, 553]


def _corpus():
    rng = random.Random(20260815)
    alphabet = string.ascii_letters + string.digits + " .,!?-_"
    texts = []
    for n in _EDGE_LENGTHS:
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    for _ in range(40):
        n = rng.randint(1, 600)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    # doc_ids cover all three modality classes
    return [(i, t) for i, t in enumerate(texts)]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO documents VALUES (?, ?)", _corpus())
    yield c
    c.close()


def _oracle(name: str) -> str:
    return load_all_queries()[name].oracle


# ---------------------------------------------------------------- specs


def _audio_stats_spec(text):
    data = text.encode() or b"\x80"
    s = [(b - 128) * 256 for b in data]
    zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
    return (len(s), max(abs(x) for x in s), sum(s), sum(x * x for x in s), zc)


def _image_stats_spec(text):
    pb = text.encode() or b"\x00"
    n_rows = max(1, len(pb) // 48)
    need = n_rows * 48
    px = (pb * (need // max(1, len(pb)) + 1))[:need]
    lum = [px[3 * p] + px[3 * p + 1] + px[3 * p + 2] for p in range(16 * n_rows)]
    return (16 * n_rows, 16, n_rows, min(lum), max(lum), sum(lum),
            max(lum) - min(lum))


def _vad_spec(text):
    data = text.encode() or b"\x80"
    s = [(b - 128) * 256 for b in data]
    n = len(s)
    nf = (n + 63) // 64
    fe = [sum(x * x for x in s[i * 64:(i + 1) * 64]) for i in range(nf)]
    tot = sum(fe)
    act = [e * nf > tot for e in fe]
    n_active = sum(act)
    n_seg = longest = run = 0
    for a in act:
        if a:
            run += 1
            if run == 1:
                n_seg += 1
            longest = max(longest, run)
        else:
            run = 0
    return (n, nf, n_active, n_seg, longest,
            n_active * 10_000 // nf if nf else 0)


def _scene_spec(text):
    data = text.encode()
    frames = []
    for off in range(0, max(len(data), 1), 256):
        fr = data[off:off + 128]
        frames.append(fr + b"\x00" * (128 - len(fr)))
    deltas = [sum(abs(a - b) for a, b in zip(frames[i], frames[i + 1]))
              for i in range(len(frames) - 1)]
    nd, tot = len(deltas), sum(deltas)
    cuts = sum(1 for d in deltas if d * nd > tot)
    return (len(frames), nd, cuts, max(deltas) if deltas else 0, tot)


def _phash_spec(text):
    pb = text.encode() or b"\x00"
    n_rows = max(1, len(pb) // 48)
    need = n_rows * 48
    px = (pb * (need // max(1, len(pb)) + 1))[:need]
    h = n_rows
    cells = [[0] * 8 for _ in range(8)]
    for i in range(8):
        r0 = i * h // 8
        r1 = max((i + 1) * h // 8, r0 + 1)
        for j in range(8):
            tot = cnt = 0
            for r in range(r0, r1):
                for c in (2 * j, 2 * j + 1):
                    p = 3 * (r * 16 + c)
                    tot += px[p] + px[p + 1] + px[p + 2]
                    cnt += 1
            cells[i][j] = tot // cnt
    thr = sum(sum(row) for row in cells) // 64
    v = 0
    for i in range(8):
        for j in range(8):
            if cells[i][j] > thr:
                v |= 1 << (8 * i + j)
    return v - (1 << 64) if v & (1 << 63) else v


# ---------------------------------------------------------------- tests


def test_audio_stats_oracle_matches_spec(con):
    got = {r[0]: tuple(r[1:])
           for r in con.execute(_oracle("multimodal_audio_stats")).fetchall()}
    exp = {d: _audio_stats_spec(t) for d, t in _corpus() if d % 3 == 1}
    assert got == exp


def test_image_stats_oracle_matches_spec_incl_tiling(con):
    got = {r[0]: tuple(r[1:])
           for r in con.execute(_oracle("multimodal_image_stats")).fetchall()}
    exp = {d: _image_stats_spec(t) for d, t in _corpus() if d % 3 == 0}
    assert got == exp
    # the corpus must actually exercise the tiling arm
    assert any(len(t) < 48 for d, t in _corpus() if d % 3 == 0)


def test_vad_oracle_matches_spec(con):
    got = {r[0]: tuple(r[1:])
           for r in con.execute(_oracle("multimodal_audio_vad")).fetchall()}
    exp = {d: _vad_spec(t) for d, t in _corpus() if d % 3 == 1}
    assert got == exp


def test_scene_oracle_matches_spec_incl_single_frame(con):
    got = {r[0]: tuple(r[1:])
           for r in con.execute(_oracle("multimodal_scene_changes")).fetchall()}
    exp = {d: _scene_spec(t) for d, t in _corpus() if d % 3 == 2}
    assert got == exp
    assert any(len(t) <= 256 for d, t in _corpus() if d % 3 == 2)


def test_phash_oracle_matches_spec_incl_short_images(con):
    got = {r[0]: r[2]
           for r in con.execute(_oracle("multimodal_phash")).fetchall()}
    exp = {d: _phash_spec(t) for d, t in _corpus() if d % 3 == 0}
    assert got == exp
    # short images hit the degenerate single-row block arm (h < 8)
    assert any(len(t) < 8 * 48 for d, t in _corpus() if d % 3 == 0)


def test_fixture_texts_are_ascii(sf_dir):
    """The oracles equate char positions with byte positions — valid
    only for pure-ASCII text — and index pixels via ``(k % len)``,
    which needs len > 0 (the Python side substitutes b'\\x00'/b'\\x80'
    for an empty payload; the SQL side would yield NULLs — ADVICE
    r10). Pin BOTH assumptions on the real fixtures so a future
    testdata change fails here, not as a driver hash mismatch."""
    c = duckdb.connect()
    n = c.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE octet_length(encode(text)) <> length(text) "
        "   OR length(text) = 0"
    ).fetchone()[0]
    assert n == 0
