"""Multimodal operator contracts (SURVEY.md §2.B-10).

The oracle gate covers ``multimodal_cols`` / ``multimodal_framesample``
values; this file pins the parts the oracle can't see: the decode
plumbing's batch shape and the honest-stub contract of the real
decoders (pillow/soundfile are not in this container — the stubs must
raise ``NotImplementedError``, not silently fake a decode)."""

from __future__ import annotations

import pandas as pd
import pytest

from nchu_bigdata_spark.operators import multimodal


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has("PIL"), reason="pillow present: stub contract n/a")
def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")


@pytest.mark.skipif(_has("soundfile"), reason="soundfile present")
def test_decode_audio_stub_contract():
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")


def test_extract_features_batch_shape():
    """The mapInPandas worker fn: per-batch in/out, schema-stable, and
    deterministic byte moments (what the rows-only driver check sees)."""
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "modality": ["image", "audio"],
            "payload": [b"abc", b""],
        }
    )
    out = list(multimodal._extract_features(iter([batch, batch])))
    assert len(out) == 2  # one output batch per input batch
    first = out[0]
    assert list(first.columns) == [
        "doc_id", "modality", "n_bytes", "byte_mean", "byte_std", "decoder",
    ]
    assert first["n_bytes"].tolist() == [3, 0]
    # byte moments of b"abc": mean of (97,98,99)
    assert first["byte_mean"].iloc[0] == pytest.approx(98.0)
    assert first["byte_mean"].iloc[1] == 0.0  # empty payload guarded
    assert (first["decoder"] == "byte-moments-stub").all()
    # deterministic across batches
    assert out[1].equals(first)


def test_decode_plumbing_runs_on_spark(spark, sf_dir):
    """End-to-end: binary column → Arrow batch → python → typed rows.
    Partition-preserving (no shuffle in the plan) and row-conserving."""
    df = multimodal.multimodal_decode(spark, sf_dir)
    n_docs = multimodal.table(spark, sf_dir, "documents").count()
    assert df.count() == n_docs
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # decode must not shuffle blobs
