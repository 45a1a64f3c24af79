"""The bench measurement record: persistence + stale re-emission.

bench.py keeps the last successful on-chip measurement per stage in
benchmarks/measured/bench_record.json so a transient axon-tunnel outage at
driver bench time degrades to re-emitting the most recent REAL measurement
(explicitly marked stale with its timestamp) instead of an empty artifact.
"""

import contextlib
import io
import json

import pytest

import bench


@pytest.fixture
def record_path(tmp_path, monkeypatch):
    path = tmp_path / "bench_record.json"
    monkeypatch.setattr(bench, "RECORD_PATH", str(path))
    return path


def _emit():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        printed = bench._emit_stale_record("tunnel down (test)")
    return printed, buf.getvalue().strip()


def test_no_record_no_emission(record_path):
    printed, out = _emit()
    assert not printed
    assert out == ""


def test_update_then_stale_emit_roundtrip(record_path):
    bench._update_record(
        "cache", 35288.2, "rays/sec/chip",
        {"batch_size": 8192, "step_ms": 232.15}, source="test",
    )
    bench._update_record(
        "material", 786.2, "rays/sec/chip",
        {"batch_size": 1536, "step_ms": 1953.73}, source="test",
    )

    stored = json.loads(record_path.read_text())
    assert set(stored["stages"]) == {"cache", "material"}
    assert stored["stages"]["cache"]["measured_utc"].endswith("Z")

    printed, out = _emit()
    assert printed
    obj = json.loads(out)
    # Driver contract: one JSON line, headline metric present.
    assert obj["metric"] == "train_rays_per_sec_cache_stage"
    assert obj["value"] == 35288.2
    assert obj["unit"] == "rays/sec/chip"
    # Staleness is explicit, never silent.
    assert obj["detail"]["stale"] is True
    assert "tunnel down" in obj["detail"]["stale_reason"]
    assert "measured_utc" in obj["detail"]["cache_stage"]
    assert obj["detail"]["material_stage"]["train_rays_per_sec"] == 786.2
    # Never-measured stages say so rather than fabricating a number.
    assert obj["detail"]["transient_stage"] == {
        "error": "never measured on-chip"
    }
    assert "anchors" in obj["detail"]


def test_update_overwrites_same_stage(record_path):
    bench._update_record("cache", 1.0, "rays/sec/chip", {}, source="test")
    bench._update_record("cache", 2.0, "rays/sec/chip", {}, source="test")
    stored = json.loads(record_path.read_text())
    assert stored["stages"]["cache"]["value"] == 2.0


def test_checked_in_seed_record_is_emittable():
    # The committed seed record must satisfy the emission contract as-is.
    printed, out = _emit()
    assert printed
    obj = json.loads(out)
    assert obj["value"] > 0
    assert obj["detail"]["cache_stage"]["batch_size"] == 8192
