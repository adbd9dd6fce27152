"""UniPC sampler parity against the reference's own torch implementation.

Runs ttts/sampler/uni_pc.py (UniPC:236, data_prediction, multistep,
time_uniform) and our scan-based ttts_tpu/diffusion/unipc.py on the same
analytic ε-model over the same continuous linear VP schedule and asserts the
trajectories agree to float32 accuracy — the solver algebra (predictor ρ_p,
corrector ρ_c solve, B(h) variants, lower_order_final tail) is verified
end-to-end, not term-by-term."""

import numpy as np
import pytest
import torch

import refshim
from ttts_tpu.diffusion.dpm import BETA_0, BETA_1
from ttts_tpu.diffusion.unipc import uni_pc_sample

import jax.numpy as jnp

B, T, C = 2, 6, 4


def _torch_sample(x0, steps, variant):
    uni = refshim.import_ref("ttts.sampler.uni_pc")
    ns = uni.NoiseScheduleVP("linear", continuous_beta_0=BETA_0,
                             continuous_beta_1=BETA_1, dtype=torch.float64)

    def model_fn(x, t):  # ε-model; t arrives as a (B,) tensor
        return torch.tanh(x) * (0.5 + 0.5 * t.view(-1, 1, 1))

    solver = uni.UniPC(model_fn, ns, algorithm_type="data_prediction",
                       variant=variant)
    with torch.no_grad():
        out = solver.sample(torch.from_numpy(x0).double(), steps=steps,
                            order=2, skip_type="time_uniform",
                            method="multistep", t_start=1.0, t_end=1e-3)
    return out.numpy()


def _jax_sample(x0, steps, variant):
    def eps_fn(x, t):  # scalar continuous t
        return jnp.tanh(x) * (0.5 + 0.5 * t)

    return np.asarray(uni_pc_sample(eps_fn, jnp.asarray(x0), steps=steps,
                                    variant=variant))


@pytest.mark.parametrize("steps", [2, 3, 8, 30])
@pytest.mark.parametrize("variant", ["bh1", "bh2"])
def test_unipc_matches_reference(steps, variant):
    x0 = np.random.default_rng(0).standard_normal((B, T, C)).astype(np.float32)
    ref = _torch_sample(x0, steps, variant)
    ours = _jax_sample(x0, steps, variant)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_unipc_close_to_dpmpp_on_smooth_model():
    """Sanity: at matched NFE both solvers integrate the same ODE — results
    should be near, not equal (different update rules)."""
    from ttts_tpu.diffusion.dpm import dpm_solver_pp_2m_sample

    def eps_fn(x, t):
        return jnp.tanh(x) * (0.5 + 0.5 * t)

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, C)).astype(np.float32))
    a = np.asarray(uni_pc_sample(eps_fn, x0, steps=30))
    b = np.asarray(dpm_solver_pp_2m_sample(eps_fn, x0, steps=30))
    assert np.max(np.abs(a - b)) < 5e-3
    assert np.isfinite(a).all()
