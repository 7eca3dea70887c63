"""Scheduler golden tests against the reference formulas
(FlowMatchEulerScheduler.swift:9-28, 77-128, 136-156, 195-260)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.ops import scheduler as sch


def test_empirical_mu_long_sequence():
    # imageSeqLen > 4300 -> pure linear a2*x + b2
    assert sch.compute_empirical_mu(5000, 28) == pytest.approx(0.00016927 * 5000 + 0.45666666)


def test_empirical_mu_short_sequence():
    # 4096 tokens, 28 steps (Dev default at 1024x1024)
    seq, steps = 4096, 28
    m200 = 0.00016927 * seq + 0.45666666
    m10 = 8.73809524e-05 * seq + 1.89833333
    a = (m200 - m10) / 190.0
    b = m200 - 200.0 * a
    assert sch.compute_empirical_mu(seq, steps) == pytest.approx(a * steps + b)


def test_sigma_schedule_shape_and_endpoints():
    s = sch.set_timesteps(num_inference_steps=28, image_seq_len=4096)
    assert len(s.sigmas) == 29
    assert s.sigmas[-1] == 0.0
    # First raw sigma is 1.0; time shift of t=1.0 gives exp(mu)/(exp(mu)+0)=1.
    assert s.sigmas[0] == pytest.approx(1.0)
    assert np.all(np.diff(s.sigmas) < 0)  # strictly decreasing


def test_time_shift_formula():
    mu = sch.compute_empirical_mu(1024, 4)
    t = np.array([0.5])
    expected = math.exp(mu) / (math.exp(mu) + (1.0 / 0.5 - 1.0) ** 1.0)
    assert sch.time_shift_exponential(mu, 1.0, t)[0] == pytest.approx(expected)


def test_strength_slicing():
    # strength 0.5 with 28 steps -> skip 14 steps
    full = sch.set_timesteps(28, image_seq_len=4096, strength=1.0)
    half = sch.set_timesteps(28, image_seq_len=4096, strength=0.5)
    assert half.t_start == 14
    assert half.num_steps == 14
    np.testing.assert_allclose(half.sigmas, full.sigmas[14:])
    # strength clamps to [0.01, 1.0]
    tiny = sch.set_timesteps(28, image_seq_len=4096, strength=0.0)
    assert tiny.t_start == 28 - int(28 * 0.01)


def test_custom_sigmas_appends_terminal():
    turbo = [1.0, 0.6509, 0.4374, 0.2932, 0.1893, 0.1108, 0.0495, 0.00031]
    s = sch.set_custom_sigmas(turbo)
    assert len(s.sigmas) == 9
    assert s.sigmas[-1] == 0.0
    assert s.num_steps == 8
    # already-terminal input is not double-appended
    s2 = sch.set_custom_sigmas([1.0, 0.5, 0.0])
    assert len(s2.sigmas) == 3


def test_euler_step():
    x = jnp.ones((1, 4))
    v = jnp.full((1, 4), 2.0)
    out = sch.euler_step(x, v, jnp.float32(0.8), jnp.float32(0.6))
    np.testing.assert_allclose(np.asarray(out), 1.0 + (0.6 - 0.8) * 2.0, rtol=1e-6)


def test_scale_noise_and_velocity():
    x0 = jnp.zeros((2, 3))
    noise = jnp.ones((2, 3))
    xt = sch.scale_noise(x0, 0.25, noise)
    np.testing.assert_allclose(np.asarray(xt), 0.25)
    v = sch.get_velocity(x0, noise)
    np.testing.assert_allclose(np.asarray(v), 1.0)


def test_timesteps_convention():
    s = sch.set_timesteps(4, image_seq_len=1024)
    np.testing.assert_allclose(s.timesteps, s.sigmas * 1000)
    pairs = s.sigma_pairs()
    assert pairs.shape == (4, 2)
    np.testing.assert_allclose(pairs[:, 0], s.sigmas[:-1])
    np.testing.assert_allclose(pairs[:, 1], s.sigmas[1:])


def test_mu_continuity_at_boundary():
    """Piecewise mu: at seq_len just over 4300, the long-sequence branch
    takes over; for 28-step Dev runs the two branches agree near 200 steps."""
    below = sch.compute_empirical_mu(4300, 200)
    above = sch.compute_empirical_mu(4301, 200)
    assert abs(below - above) < 1e-2  # continuous at num_steps=200


def test_sigmas_shift_with_resolution():
    """Within the long-sequence regime (seq > 4300), more tokens -> larger mu
    -> the schedule holds higher sigmas at the same step index."""
    small = sch.set_timesteps(28, image_seq_len=4400)
    large = sch.set_timesteps(28, image_seq_len=8192)
    assert large.mu > small.mu
    assert (large.sigmas[1:-1] > small.sigmas[1:-1]).all()


def test_schedule_is_pure_function_of_inputs():
    a = sch.set_timesteps(8, image_seq_len=2048, strength=0.75)
    b = sch.set_timesteps(8, image_seq_len=2048, strength=0.75)
    np.testing.assert_array_equal(a.sigmas, b.sigmas)
    assert a.t_start == b.t_start == 2
