"""Flow-matching sigma schedules and the Euler stepper.

Pure functions; the schedule is computed host-side with numpy (it is a
handful of floats) and the Euler step is a jit-friendly jnp function that is
folded into the compiled denoise step.

Reference behavior: Sources/LTXVideo/Scheduler/LTXScheduler.swift:18-341.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

# Official distilled sigma schedule: 9 values for 8 steps
# (reference: LTXScheduler.swift:18-28).
DISTILLED_SIGMAS = np.array(
    [1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375, 0.725, 0.421875, 0.0],
    dtype=np.float32,
)

# Stage-2 refinement sigmas for two-stage generation
# (reference: LTXScheduler.swift:31-36).
STAGE_2_SIGMAS = np.array([0.909375, 0.725, 0.421875, 0.0], dtype=np.float32)

BASE_SHIFT_ANCHOR = 1024
MAX_SHIFT_ANCHOR = 4096


def compute_mu(
    token_count: int, base_shift: float = 0.95, max_shift: float = 2.05
) -> float:
    """Token-count-dependent shift exponent, linear between the anchors
    (1024, base_shift) -> (4096, max_shift); tokens clamp at 4096.

    Reference: LTXScheduler.swift:92-98.
    """
    clamped = min(token_count, MAX_SHIFT_ANCHOR)
    slope = (max_shift - base_shift) / (MAX_SHIFT_ANCHOR - BASE_SHIFT_ANCHOR)
    intercept = base_shift - slope * BASE_SHIFT_ANCHOR
    return float(clamped) * slope + intercept


def _time_shift(sigmas: np.ndarray, mu: float) -> np.ndarray:
    """sigma' = e^mu / (e^mu + 1/sigma - 1), fixed points at 0 and 1.

    Reference: LTXScheduler.swift:99-107.
    """
    exp_mu = np.exp(np.float32(mu))
    out = sigmas.copy()
    interior = (sigmas != 0.0) & (sigmas != 1.0)
    s = sigmas[interior]
    out[interior] = exp_mu / (exp_mu + (1.0 / s - 1.0))
    return out


def _stretch_to_terminal(sigmas: np.ndarray, terminal: float) -> np.ndarray:
    """Rescale so the last non-zero sigma maps to `terminal`, preserving the
    zero terminal entry. Reference: LTXScheduler.swift:108-119, 157-175.

    `sigmas` must end with the terminal 0.0; the last *non-zero* entry is
    sigmas[-2].
    """
    one_minus = 1.0 - sigmas
    last_one_minus = one_minus[-2]
    if last_one_minus <= 0:
        return sigmas
    scale = last_one_minus / (1.0 - terminal)
    out = 1.0 - one_minus / scale
    out[sigmas == 0.0] = 0.0
    return out.astype(np.float32)


def get_sigmas(
    num_steps: int,
    distilled: bool = False,
    token_count: Optional[int] = None,
    max_shift: float = 2.05,
    base_shift: float = 0.95,
    stretch: bool = True,
    terminal: float = 0.1,
) -> np.ndarray:
    """Build the sigma schedule (num_effective_steps + 1 values, last = 0.0).

    Distilled: the fixed 9-value table, optionally dynamically shifted by
    token count then stretched to the terminal value
    (reference: LTXScheduler.swift:86-128). `num_steps` is ignored (the table
    defines 8 steps).

    Dev: linear 1 -> 0 over num_steps, always shifted (token count defaults
    to the 4096 clamp) and stretched (reference: LTXScheduler.swift:129-179).
    """
    if distilled:
        sigmas = DISTILLED_SIGMAS[DISTILLED_SIGMAS > 0].copy()
        if token_count is not None:
            mu = compute_mu(token_count, base_shift, max_shift)
            sigmas = _time_shift(sigmas, mu)
            sigmas = np.append(sigmas, np.float32(0.0))
            if stretch:
                sigmas = _stretch_to_terminal(sigmas, terminal)
        else:
            sigmas = np.append(sigmas, np.float32(0.0))
        return sigmas.astype(np.float32)

    tokens = min(token_count if token_count is not None else MAX_SHIFT_ANCHOR,
                 MAX_SHIFT_ANCHOR)
    sigmas = 1.0 - np.arange(num_steps + 1, dtype=np.float32) / np.float32(num_steps)
    mu = compute_mu(tokens, base_shift, max_shift)
    sigmas = _time_shift(sigmas, mu)
    if stretch and num_steps > 0:
        sigmas = _stretch_to_terminal(sigmas, terminal)
    return sigmas.astype(np.float32)


def with_terminal(sigmas: Sequence[float]) -> np.ndarray:
    """Append terminal 0.0 if missing (reference: LTXScheduler.swift:187-204)."""
    arr = np.asarray(sigmas, dtype=np.float32)
    if arr.size == 0 or arr[-1] != 0.0:
        arr = np.append(arr, np.float32(0.0))
    return arr


def euler_step(latent, velocity, sigma, sigma_next):
    """One flow-matching Euler step, jit-friendly (sigma/sigma_next may be
    traced scalars so all steps share a single compilation).

    Numerics follow the reference exactly (LTXScheduler.swift:305-327):
    `denoised` is computed in float32 then rounded back to the latent dtype
    before re-entering the float32 Euler update — this bf16 round-trip is
    intentional and matches the Python/MLX implementation it was validated
    against.

    The terminal step (sigma_next == 0) returns `denoised` directly; using
    jnp.where keeps this branch-free so the same compiled step handles every
    index.
    """
    dtype = latent.dtype
    latent_f32 = latent.astype(jnp.float32)
    velocity_f32 = velocity.astype(jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    sigma_next = jnp.asarray(sigma_next, jnp.float32)

    denoised = (latent_f32 - sigma * velocity_f32).astype(dtype)
    denoised_f32 = denoised.astype(jnp.float32)

    stepped = denoised_f32 + sigma_next * (latent_f32 - denoised_f32) / sigma
    out = jnp.where(sigma_next > 0, stepped, denoised_f32)
    return out.astype(dtype)


def add_noise(samples, noise, sigma):
    """Flow matching forward: x_t = (1 - t) x_0 + t noise
    (reference: LTXScheduler.swift:334-341)."""
    t = jnp.asarray(sigma, samples.dtype)
    return (1 - t) * samples + t * noise


def velocity_target(sample, noise):
    """v = noise - sample (reference: LTXScheduler.swift:354-357)."""
    return noise - sample
