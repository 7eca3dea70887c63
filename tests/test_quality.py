"""Quality-metric protocol tests (PSNR / ΔE / color-chart)."""

import numpy as np
import pytest

from flux2_tpu.utils import quality as q


def test_psnr_identical_and_known():
    a = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    assert q.psnr(a, a) == float("inf")
    b = a + 0.1
    # mse = 0.01 -> psnr = 20 dB
    assert q.psnr(np.zeros_like(a), np.full_like(a, 0.1)) == pytest.approx(20.0, abs=1e-6)
    assert q.psnr(a, b) == pytest.approx(20.0, abs=0.5)


def test_mean_rgb_delta_units():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 1.7 / 255.0)  # the reference's qint8 verdict number
    assert q.mean_rgb_delta(a, b) == pytest.approx(1.7, abs=1e-6)


def test_srgb_to_lab_reference_points():
    # white -> L=100, a~0, b~0
    lab = q.srgb_to_lab(np.array([1.0, 1.0, 1.0]))
    assert lab[0] == pytest.approx(100.0, abs=0.1)
    assert abs(lab[1]) < 0.5 and abs(lab[2]) < 0.5
    # black -> L=0
    assert q.srgb_to_lab(np.zeros(3))[0] == pytest.approx(0.0, abs=0.1)


def test_delta_e_zero_for_identical():
    c = np.array([0.3, 0.6, 0.2])
    assert q.delta_e_cie76(c, c) == pytest.approx(0.0)
    assert q.delta_e_cie76(np.zeros(3), np.ones(3)) == pytest.approx(100.0, abs=1.0)


def test_color_chart_roundtrip():
    """Rendering the chart and measuring it back gives ΔE ~ 0."""
    img = q.color_chart_image(cell=32)
    stats = q.color_chart_delta_e(img)
    assert stats["mean_delta_e"] < 0.01
    assert stats["max_delta_e"] < 0.01


def test_color_chart_detects_shift():
    img = np.clip(q.color_chart_image(cell=32) * 0.8, 0, 1)  # darken 20%
    stats = q.color_chart_delta_e(img)
    assert stats["mean_delta_e"] > 3.0


def test_compare_images_bundle():
    a = np.random.RandomState(1).rand(32, 32, 3).astype(np.float32)
    out = q.compare_images(a, a)
    assert out["psnr_db"] == float("inf")
    assert out["mean_rgb_delta_255"] == 0.0
    assert out["mean_delta_e"] == pytest.approx(0.0)
