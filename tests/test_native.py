"""Native C++ image ops: availability + parity with numpy fallbacks."""

import numpy as np
import pytest

from flux2_tpu.utils import native


def test_native_lib_builds_and_loads():
    assert native.available(), "native image ops library should build (g++ in toolchain)"


def _with_fallback(fn, *args):
    lib, tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        return fn(*args)
    finally:
        native._lib, native._tried = lib, tried


def test_area_resize_parity():
    plane = np.random.RandomState(0).rand(97, 53).astype(np.float32)
    a = native.area_resize(plane, 8, 8)
    b = _with_fallback(native.area_resize, plane, 8, 8)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # exact mean semantics on a divisible grid
    p2 = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = native.area_resize(p2, 2, 2)
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_bilinear_parity():
    img = np.random.RandomState(1).rand(31, 41, 3).astype(np.float32)
    a = native.resize_bilinear(img, 17, 23)
    b = _with_fallback(native.resize_bilinear, img, 17, 23)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # identity resize
    same = native.resize_bilinear(img, 31, 41)
    np.testing.assert_allclose(same, img, atol=1e-6)


def test_u8_conversions_roundtrip():
    u = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
    f = native.u8_to_f32(u)
    np.testing.assert_allclose(f, u / 255.0, atol=1e-6)
    np.testing.assert_array_equal(native.f32_to_u8(f), u)


def test_soft_composite():
    orig = np.zeros((4, 4, 3), np.float32)
    gen = np.ones((4, 4, 3), np.float32)
    mask = np.full((4, 4), 0.25, np.float32)
    out = native.soft_composite(orig, gen, mask)
    np.testing.assert_allclose(out, 0.25, atol=1e-6)
    b = _with_fallback(native.soft_composite, orig, gen, mask)
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_dilate_ramp_matches_numpy_reference():
    """The C++ chamfer dilate+ramp must equal the iterated-erosion numpy
    path exactly (same layer values, same border semantics)."""
    from flux2_tpu.chains.subject_mask import _dilate, _inward_ramp
    from flux2_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    for dilation, ramp in ((0, 0), (2, 0), (0, 3), (3, 4), (8, 16)):
        mask = (rng.rand(48, 64) > 0.85).astype(np.float32)
        ref = _inward_ramp(_dilate(mask, dilation), ramp)
        got = native.dilate_ramp(mask, dilation, ramp)
        np.testing.assert_allclose(got, ref, atol=1e-6)
