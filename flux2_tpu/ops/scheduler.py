"""Flow-matching Euler scheduler for FLUX.2, as pure jnp/numpy math.

Behavior-equivalent to the reference's rectified-flow scheduler
(``Sources/Flux2Core/Scheduler/FlowMatchEulerScheduler.swift``), re-expressed
TPU-first: the schedule is a *static* numpy array computed once on the host
(sigma schedules are tiny and shape the compiled program), while the per-step
math (`euler_step`, `scale_noise`, `get_velocity`) is pure jnp so the whole
denoise loop compiles into a single ``lax.scan``.

Reference anchors (for parity checking, not copied):
  - computeEmpiricalMu: FlowMatchEulerScheduler.swift:9-28
  - sigma schedule + exponential time shift: :77-128
  - strength slicing: :91-101
  - euler step: :136-156
  - scaleNoise / getVelocity: :195-214
  - custom sigmas (Turbo LoRAs): :236-260
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

NUM_TRAIN_TIMESTEPS = 1000


def compute_empirical_mu(image_seq_len: int, num_steps: int) -> float:
    """FLUX.2 empirical time-shift parameter mu.

    Piecewise-linear in image sequence length; for short sequences it also
    interpolates in the number of steps. Matches diffusers'
    ``pipeline_flux2`` empirical fit (see reference
    FlowMatchEulerScheduler.swift:9-28).
    """
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666

    if image_seq_len > 4300:
        return a2 * image_seq_len + b2

    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return a * num_steps + b


def time_shift_exponential(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    """Exponential time shift: exp(mu) / (exp(mu) + (1/t - 1)**sigma)."""
    exp_mu = math.exp(mu)
    return exp_mu / (exp_mu + (1.0 / t - 1.0) ** sigma)


@dataclasses.dataclass(frozen=True)
class SigmaSchedule:
    """A fully-resolved sigma schedule.

    ``sigmas`` has ``n_effective + 1`` entries ending in the terminal 0.0;
    step i integrates from sigmas[i] to sigmas[i+1]. ``t_start`` records how
    many steps were skipped for img2img strength (0 for T2I).
    """

    sigmas: np.ndarray  # float32 [n+1], descending, terminal 0.0
    t_start: int
    mu: float

    @property
    def num_steps(self) -> int:
        return len(self.sigmas) - 1

    @property
    def initial_sigma(self) -> float:
        return float(self.sigmas[0]) if len(self.sigmas) else 1.0

    @property
    def timesteps(self) -> np.ndarray:
        """Timesteps in the [0, 1000] convention (sigma * num_train_timesteps)."""
        return self.sigmas * NUM_TRAIN_TIMESTEPS

    def sigma_pairs(self) -> np.ndarray:
        """[n, 2] array of (sigma, sigma_next) per step — the lax.scan xs."""
        return np.stack([self.sigmas[:-1], self.sigmas[1:]], axis=-1)


def set_timesteps(
    num_inference_steps: int,
    image_seq_len: Optional[int] = None,
    strength: float = 1.0,
    mu: Optional[float] = None,
) -> SigmaSchedule:
    """Build the FLUX.2 sigma schedule.

    sigmas = linspace(1, 1/N over N points) -> exponential time shift by
    empirical mu -> terminal 0.0 appended -> strength-based prefix skip.
    """
    if mu is None:
        seq_len = image_seq_len if image_seq_len is not None else 4096
        mu = compute_empirical_mu(seq_len, num_inference_steps)

    raw = 1.0 - np.arange(num_inference_steps, dtype=np.float64) / num_inference_steps
    shifted = time_shift_exponential(mu, 1.0, raw)
    sigmas = np.concatenate([shifted, [0.0]]).astype(np.float32)

    clamped = min(max(strength, 0.01), 1.0)
    t_start = max(0, num_inference_steps - int(num_inference_steps * clamped))
    return SigmaSchedule(sigmas=sigmas[t_start:], t_start=t_start, mu=mu)


def set_custom_sigmas(custom_sigmas: Sequence[float]) -> SigmaSchedule:
    """Schedule from an explicit sigma list (Turbo-LoRA style overrides).

    A terminal 0.0 is appended when absent so N input sigmas always yield N
    denoising steps.
    """
    sig = list(float(s) for s in custom_sigmas)
    if not sig:
        raise ValueError("custom sigmas must be non-empty")
    if sig[-1] != 0.0:
        sig.append(0.0)
    return SigmaSchedule(sigmas=np.asarray(sig, dtype=np.float32), t_start=0, mu=float("nan"))


# ---------------------------------------------------------------------------
# Per-step math (pure jnp; used inside jit/scan)
# ---------------------------------------------------------------------------


def euler_step(sample: jnp.ndarray, velocity: jnp.ndarray, sigma: jnp.ndarray, sigma_next: jnp.ndarray) -> jnp.ndarray:
    """x_{next} = x + (sigma_next - sigma) * v."""
    dt = (sigma_next - sigma).astype(sample.dtype)
    return sample + dt * velocity.astype(sample.dtype)


def scale_noise(sample: jnp.ndarray, sigma: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Flow-matching forward interpolation: x_t = (1 - sigma) * x0 + sigma * noise."""
    sigma = jnp.asarray(sigma, dtype=sample.dtype)
    return (1.0 - sigma) * sample + sigma * noise.astype(sample.dtype)


def get_velocity(sample: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Rectified-flow velocity target: v = noise - sample."""
    return noise - sample
