"""UniPC multistep sampler (order 2, data prediction, B(h) variants) as one
lax.scan.

Rebuilds ttts/sampler/uni_pc.py (UniPC:236, multistep_uni_pc_bh_update:471,
sample:590) the TPU way: the per-step predictor–corrector algebra is carried
in a single scan over precomputed λ/α/σ tables; the corrector's model
evaluation doubles as the next step's `model_prev` exactly as the reference's
`model_prev_list[-1] = model_x` bookkeeping does, so NFE == steps, same as
DPM-Solver++(2M).

The reference's only consumer (ttts/diffusion/diffusion_util.py:563, a dead
v1-era path) calls it with variant='bh2', order=2, skip_type='time_uniform',
method='multistep' — those are the semantics implemented here, on the same
continuous linear VP schedule the live serving path uses
(ttts/utils/diffusion.py k_diffusion_sample_loop: β₀=0.1/4, β₁=20/4).
`lower_order_final` (uni_pc.py:636-639): the last step drops to order 1 and
skips the corrector (uni_pc.py:641-645).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ttts_tpu.diffusion.dpm import _alpha_sigma, _marginal_lambda


def uni_pc_sample(
    eps_fn: Callable,
    noise: jax.Array,
    steps: int = 30,
    t_start: float = 1.0,
    t_end: float = 1e-3,
    variant: str = "bh2",
):
    """Sample with multistep UniPC-2 (predictor + corrector).

    eps_fn(x, t_cont) → ε at continuous scalar time t (the caller folds in
    CFG/conditioning — see dpm.cfg_eps_fn); noise: (B, T, C). Requires
    steps >= 2 (reference asserts steps >= order, uni_pc.py:607).
    """
    if steps < 2:
        raise ValueError("UniPC-2 needs steps >= 2")
    if variant not in ("bh1", "bh2"):
        raise NotImplementedError(variant)  # uni_pc.py:514

    ts = jnp.linspace(t_start, t_end, steps + 1)
    lambdas = _marginal_lambda(ts)
    alphas, sigmas = _alpha_sigma(ts)

    def data_pred(x, t):
        alpha, sigma = _alpha_sigma(t)
        return (x - sigma * eps_fn(x, t)) / alpha

    def b_of_h(hh):
        # uni_pc.py:509-512
        return hh if variant == "bh1" else jnp.expm1(hh)

    x = noise
    m0 = data_pred(x, ts[0])

    # ---- step 1: order-1 update with corrector (uni_pc.py:621-632) --------
    h = lambdas[1] - lambdas[0]
    hh = -h  # predict_x0 (uni_pc.py:503)
    phi1 = jnp.expm1(hh)
    x_t_ = (sigmas[1] / sigmas[0]) * x - alphas[1] * phi1 * m0
    # predictor has no D1s at order 1 → x_pred = x_t_; corrector ρ_c = [0.5]
    m1 = data_pred(x_t_, ts[1])
    x = x_t_ - alphas[1] * b_of_h(hh) * 0.5 * (m1 - m0)

    # ---- steps 2..steps−1: order-2 predictor+corrector (uni_pc.py:634-658)
    def step(carry, i):
        x, m_prev0, m_prev1 = carry  # m at ts[i−1] (recent) and ts[i−2]
        l_pp, l_p, l_c = lambdas[i - 2], lambdas[i - 1], lambdas[i]
        t_c = ts[i]
        a_c, s_c = alphas[i], sigmas[i]
        s_p = sigmas[i - 1]

        h = l_c - l_p
        r0 = (l_pp - l_p) / h  # uni_pc.py:493
        d1_0 = (m_prev1 - m_prev0) / r0
        hh = -h
        phi1 = jnp.expm1(hh)
        h_phi_k = phi1 / hh - 1.0
        bh = b_of_h(hh)
        # b-vector for order 2 (uni_pc.py:516-522): b1 at factorial 1, then
        # h_phi_k ← h_phi_k/hh − 1/2 and b2 at factorial 2
        b1 = h_phi_k / bh
        b2 = (h_phi_k / hh - 0.5) * 2.0 / bh
        # ρ_c = solve([[1,1],[r0,1]], [b1,b2]) in closed form
        rc0 = (b2 - b1) / (r0 - 1.0)
        rc1 = b1 - rc0

        x_t_ = (s_c / s_p) * x - a_c * phi1 * m_prev0
        x_pred = x_t_ - a_c * bh * 0.5 * d1_0  # ρ_p = [0.5] (uni_pc.py:534)
        m_t = data_pred(x_pred, t_c)
        x_new = x_t_ - a_c * bh * (rc0 * d1_0 + rc1 * (m_t - m_prev0))
        return (x_new, m_t, m_prev0), None

    if steps > 2:
        (x, m_prev0, _), _ = jax.lax.scan(
            step, (x, m1, m0), jnp.arange(2, steps)
        )
    else:
        m_prev0 = m1

    # ---- final step: order 1, no corrector (lower_order_final) ------------
    h = lambdas[steps] - lambdas[steps - 1]
    x = (sigmas[steps] / sigmas[steps - 1]) * x \
        - alphas[steps] * jnp.expm1(-h) * m_prev0
    return x
