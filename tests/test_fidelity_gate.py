"""tools/fidelity_gate.py — the real-weights fidelity gate harness.

Hermetic coverage: the fixture registry points at PNGs the reference
actually ships, the offline download probe records an honest outcome, and
(slow) a random-init run produces a scored no-checkpoint row end-to-end.
"""

import importlib.util
import json
import os
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "fidelity_gate.py")
_REF = "/root/reference/docs/examples"


def _load():
    spec = importlib.util.spec_from_file_location("fidelity_gate", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fidelity_gate"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference tree not present")
def test_fixture_registry_points_at_shipped_pngs():
    fg = _load()
    missing = [f.name for f in fg.FIXTURES if not os.path.exists(os.path.join(_REF, f.reference_png))]
    assert not missing, f"fixtures without reference PNGs: {missing}"
    # protocol constants from quantization-benchmark/README.md
    assert all(f.seed == 42 for f in fg.FIXTURES)
    assert all(f.steps == (28 if f.model == "dev" else 4) for f in fg.FIXTURES)


def test_download_probe_is_honest_offline():
    """With no network and no cached payload the probe must NOT claim
    success (huggingface_hub returns a stale empty local_dir; the probe
    verifies an actual .safetensors payload exists)."""
    fg = _load()
    out = fg.attempt_download("klein-4b")
    assert out["model"] == "klein-4b"
    assert out["outcome"] in ("unavailable", "already_present", "downloaded")
    if out["outcome"] == "downloaded":
        # only believable with a verified payload on disk
        assert any(f.endswith(".safetensors") for f in os.listdir(out["path"]))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference tree not present")
def test_random_init_produces_honest_no_checkpoint_row(tmp_path):
    """The harness runs end-to-end without checkpoints: generates, scores
    against the shipped PNG, marks the row no_checkpoint, and exits 0 (a
    harness-validation run must not fail the gate)."""
    fg = _load()
    fg.FIXTURES = [fg.Fixture(
        "klein4b_bf16", "klein-4b", "bf16",
        "quantization-benchmark/images/klein4b_bf16.png",
        steps=1, width=128, height=128,
    )]
    out = tmp_path / "fid.json"
    sys.argv = ["fidelity_gate", "--random-init", "--models", "klein-4b",
                "--quantizations", "bf16", "--out", str(out)]
    rc = fg.main()
    assert rc == 0
    report = json.loads(out.read_text())
    (row,) = report["rows"]
    assert row["no_checkpoint"] and not row["pass"]
    assert "psnr_db" in row and "mean_delta_e" in row
    assert report["gate"]["no_checkpoint"] == 1 and report["gate"]["scored"] == 0
