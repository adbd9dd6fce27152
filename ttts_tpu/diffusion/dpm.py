"""DPM-Solver++(2M) multistep sampler with classifier-free guidance, as one
lax.scan.

Matches the reference inference path (ttts/utils/diffusion.py
k_diffusion_sample_loop:487-580): a continuous linear VP schedule with
β₀=0.1/4, β₁=20/4, ε-prediction model called with t·1000 (fractional
timesteps), CFG `ε = ε_uncond + k·(ε_cond − ε_uncond)` (dpm_solver.py
model_wrapper:170, guidance_type='classifier-free'), order 2, time_uniform
skip, multistep method (dpm_solver.py DPM_Solver:337).

The cond and uncond branches are batched into ONE model call of 2B — the two
forwards the reference issues per step (diffusion.py:534-541) become a single
MXU-friendlier batch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


BETA_0 = 0.1 / 4
BETA_1 = 20.0 / 4


def _marginal_log_alpha(t):
    """log α_t of the continuous VP schedule (dpm_solver.py NoiseScheduleVP:6,
    schedule='linear')."""
    return -0.25 * t**2 * (BETA_1 - BETA_0) - 0.5 * t * BETA_0


def _marginal_lambda(t):
    log_alpha = _marginal_log_alpha(t)
    log_sigma = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_alpha))
    return log_alpha - log_sigma


def _alpha_sigma(t):
    log_alpha = _marginal_log_alpha(t)
    alpha = jnp.exp(log_alpha)
    sigma = jnp.sqrt(1.0 - jnp.exp(2.0 * log_alpha))
    return alpha, sigma


def dpm_solver_pp_2m_sample(
    eps_fn: Callable,
    noise: jax.Array,
    steps: int = 50,
    t_start: float = 1.0,
    t_end: float = 1e-3,
):
    """Sample with DPM-Solver++(2M).

    eps_fn(x, t_cont) → ε prediction at continuous time t (scalar), where the
    caller folds in CFG/conditioning (see cfg_eps_fn). noise: (B, T, C).
    """
    ts = jnp.linspace(t_start, t_end, steps + 1)
    lambdas = _marginal_lambda(ts)

    def data_pred(x, t):
        alpha, sigma = _alpha_sigma(t)
        eps = eps_fn(x, t)
        return (x - sigma * eps) / alpha

    x = noise
    # first model evaluation at t_0
    m_prev = data_pred(x, ts[0])

    # first update: DPM-Solver++(1) from ts[0] → ts[1]
    alpha1, sigma1 = _alpha_sigma(ts[1])
    _, sigma0 = _alpha_sigma(ts[0])
    h1 = lambdas[1] - lambdas[0]
    x = (sigma1 / sigma0) * x - alpha1 * jnp.expm1(-h1) * m_prev

    def step(carry, i):
        x, m_prev, m_prev2 = carry
        t_prev2, t_prev, t_cur = ts[i - 1], ts[i], ts[i + 1]
        l_prev2, l_prev, l_cur = lambdas[i - 1], lambdas[i], lambdas[i + 1]
        m_cur = data_pred(x, t_prev)

        h = l_cur - l_prev
        h_prev = l_prev - l_prev2
        r0 = h_prev / h
        D = m_cur + (1.0 / (2.0 * r0)) * (m_cur - m_prev)

        alpha_c, sigma_c = _alpha_sigma(t_cur)
        _, sigma_p = _alpha_sigma(t_prev)
        x = (sigma_c / sigma_p) * x - alpha_c * jnp.expm1(-h) * D
        return (x, m_cur, m_prev), None

    if steps > 1:
        (x, _, _), _ = jax.lax.scan(step, (x, m_prev, m_prev), jnp.arange(1, steps))
    return x


def cfg_eps_fn(model_trunk: Callable, cond_emb: jax.Array, uncond_emb: jax.Array,
               guidance_scale: float):
    """Build an eps_fn that evaluates cond+uncond in ONE 2B-batch model call.

    model_trunk(x2b, t2b, emb2b) → (2B, T, 2C) with [ε; var]; ε is the first
    half of the channels (diffusion.py:507-509 model_split)."""

    emb2 = jnp.concatenate([uncond_emb, cond_emb], axis=0)

    def eps_fn(x, t):
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t * 1000.0, jnp.float32)
        out = model_trunk(x2, t2, emb2)
        eps = jnp.split(out, 2, axis=-1)[0]
        eps_uncond, eps_cond = eps[:b], eps[b:]
        return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

    return eps_fn
