"""Gaussian diffusion engine (ε-prediction, learned-range variance).

TPU-native rebuild of the OpenAI guided-diffusion engine as forked by the
reference (ttts/utils/diffusion.py:162-1270): β schedules
(get_named_beta_schedule:83), q/posterior math (:209-228), p_mean_variance
with classifier-free blending and ramped guidance strength (:284-355),
training losses = MSE(ε) + VLB on the learned-range variance with frozen mean
(:930-1010), SpacedDiffusion timestep respacing (:1172-1270), and samplers:
ancestral p_sample_loop (:654), ddim (:819) — both as lax.scan here — plus the
DPM-Solver++(2M) path in ttts_tpu/diffusion/dpm.py (:487-580).

Schedule tables are numpy constants baked into the jitted programs; all
per-step math is jnp with static shapes. Model convention: channels-last mel
(B, T, C_in); the network outputs 2*C_in channels = [ε ; variance-fraction].
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """'linear' (Ho et al., scaled to any T) or 'cosine' (diffusion.py:83-110)."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(num_diffusion_timesteps):
            t1 = i / num_diffusion_timesteps
            t2 = (i + 1) / num_diffusion_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(schedule_name)


def _extract(arr: np.ndarray, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to ndim dims."""
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )


@dataclass
class GaussianDiffusion:
    """ε-prediction / learned-range diffusion over `betas`.

    model signature: model(x, t_float, **model_kwargs) → (B, T, 2*C).
    """

    betas: np.ndarray
    rescale_timesteps: bool = False
    conditioning_free: bool = False
    conditioning_free_k: float = 1.0
    ramp_conditioning_free: bool = True

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        self.num_timesteps = betas.shape[0]
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.log_one_minus_alphas_cumprod = np.log(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)
        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:])
        )
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)
        )
        self.betas = betas

    # ----------------------------------------------------------------- q math

    def q_sample(self, x_start, t, noise):
        """Diffuse to timestep t (diffusion.py q_sample)."""
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        var = _extract(self.posterior_variance, t, nd)
        logvar = _extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, logvar

    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _scale_timesteps(self, t):
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    def _t_for_model(self, t):
        """Hook for SpacedDiffusion's timestep remap."""
        return self._scale_timesteps(t)

    # ------------------------------------------------------------ p(x_{t-1}|x_t)

    def p_mean_variance(self, model_fn, x, t, clip_denoised=False, model_kwargs=None):
        """Learned-range variance split + optional classifier-free blend with
        ramped strength cfk*(1 - t/T) (diffusion.py:284-355)."""
        model_kwargs = model_kwargs or {}
        b, tt, c = x.shape
        t_in = self._t_for_model(t)
        out = model_fn(x, t_in, **model_kwargs)
        model_output, model_var_values = jnp.split(out, 2, axis=-1)

        if self.conditioning_free:
            out_nc = model_fn(x, t_in, conditioning_free=True, **model_kwargs)
            model_output_no_cond, _ = jnp.split(out_nc, 2, axis=-1)
            if self.ramp_conditioning_free:
                cfk = self.conditioning_free_k * (
                    1.0 - self._scale_timesteps(t).astype(jnp.float32)[0] / self.num_timesteps
                )
            else:
                cfk = self.conditioning_free_k
            model_output = (1 + cfk) * model_output - cfk * model_output_no_cond

        nd = x.ndim
        min_log = _extract(self.posterior_log_variance_clipped, t, nd)
        max_log = _extract(np.log(self.betas), t, nd)
        frac = (model_var_values + 1) / 2
        model_log_variance = frac * max_log + (1 - frac) * min_log
        model_variance = jnp.exp(model_log_variance)

        pred_xstart = self._predict_xstart_from_eps(x, t, model_output)
        if clip_denoised:
            pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ---------------------------------------------------------------- training

    def training_losses(self, model_fn, x_start, t, noise_key, model_kwargs=None):
        """MSE(ε) + VLB with frozen mean (diffusion.py:930-1010).
        Returns dict of per-example losses (B,)."""
        model_kwargs = model_kwargs or {}
        noise = jax.random.normal(noise_key, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        out = model_fn(x_t, self._t_for_model(t), **model_kwargs)
        model_output, model_var_values = jnp.split(out, 2, axis=-1)

        # VLB on variance only: freeze the mean prediction
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
        )
        vb = self._vb_terms_bpd(frozen, x_start, x_t, t)

        mse = jnp.mean((noise - model_output) ** 2, axis=tuple(range(1, x_start.ndim)))
        return {"loss": mse + vb, "mse": mse, "vb": vb, "x_t": x_t}

    def _vb_terms_bpd(self, frozen_out, x_start, x_t, t):
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
        model_output, model_var_values = jnp.split(frozen_out, 2, axis=-1)
        nd = x_t.ndim
        min_log = _extract(self.posterior_log_variance_clipped, t, nd)
        max_log = _extract(np.log(self.betas), t, nd)
        frac = (model_var_values + 1) / 2
        model_log_variance = frac * max_log + (1 - frac) * min_log
        pred_xstart = self._predict_xstart_from_eps(x_t, t, model_output)
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x_t, t)

        kl = normal_kl(true_mean, true_logvar, model_mean, model_log_variance)
        kl = jnp.mean(kl, axis=tuple(range(1, nd))) / math.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, model_mean, 0.5 * model_log_variance
        )
        decoder_nll = jnp.mean(decoder_nll, axis=tuple(range(1, nd))) / math.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)

    # ---------------------------------------------------------------- samplers

    def p_sample_loop(self, model_fn, shape, key, clip_denoised=False, model_kwargs=None):
        """Ancestral sampling as one lax.scan (diffusion.py:654-712)."""
        key, nk = jax.random.split(key)
        x = jax.random.normal(nk, shape)
        # keys pre-split outside the loop (an in-scan split costs ~145 us on
        # TPU; see models/gpt.py inference_speech)
        step_keys = jax.random.split(key, self.num_timesteps)

        def step(carry, xs):
            t_scalar, nk = xs
            x = carry
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            out = self.p_mean_variance(model_fn, x, t, clip_denoised, model_kwargs)
            noise = jax.random.normal(nk, shape)
            nonzero = (t_scalar != 0).astype(x.dtype)
            x = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
            return x, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        x, _ = jax.lax.scan(step, x, (ts, step_keys))
        return x

    def ddim_sample_loop(self, model_fn, shape, key, eta=0.0, clip_denoised=False,
                         model_kwargs=None):
        """DDIM sampling as one lax.scan (diffusion.py:819-928)."""
        key, nk = jax.random.split(key)
        x = jax.random.normal(nk, shape)
        step_keys = jax.random.split(key, self.num_timesteps)

        def step(carry, xs):
            t_scalar, nk = xs
            x = carry
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            out = self.p_mean_variance(model_fn, x, t, clip_denoised, model_kwargs)
            eps = (
                _extract(self.sqrt_recip_alphas_cumprod, t, x.ndim) * x - out["pred_xstart"]
            ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x.ndim)
            abar = _extract(self.alphas_cumprod, t, x.ndim)
            abar_prev = _extract(self.alphas_cumprod_prev, t, x.ndim)
            sigma = (
                eta
                * jnp.sqrt((1 - abar_prev) / (1 - abar))
                * jnp.sqrt(1 - abar / abar_prev)
            )
            noise = jax.random.normal(nk, shape)
            mean_pred = (
                out["pred_xstart"] * jnp.sqrt(abar_prev)
                + jnp.sqrt(1 - abar_prev - sigma**2) * eps
            )
            nonzero = (t_scalar != 0).astype(x.dtype)
            x = mean_pred + nonzero * sigma * noise
            return x, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        x, _ = jax.lax.scan(step, x, (ts, step_keys))
        return x


class SpacedDiffusion(GaussianDiffusion):
    """Skip-step respacing (diffusion.py:1172-1270): keep `use_timesteps` of
    the base schedule, recompute betas, and remap model timesteps through
    `timestep_map` (diffusion.py:1275-1293 _WrappedModel)."""

    def __init__(self, use_timesteps: Sequence[int], betas: np.ndarray, **kwargs):
        use_timesteps = sorted(set(int(i) for i in use_timesteps))
        self.use_timesteps = use_timesteps
        self.original_num_steps = len(betas)
        base = GaussianDiffusion(betas=betas)
        last_alpha_cumprod = 1.0
        new_betas = []
        self.timestep_map = []
        for i, acp in enumerate(base.alphas_cumprod):
            if i in set(use_timesteps):
                new_betas.append(1 - acp / last_alpha_cumprod)
                last_alpha_cumprod = acp
                self.timestep_map.append(i)
        super().__init__(betas=np.array(new_betas), **kwargs)

    def _t_for_model(self, t):
        mapped = jnp.asarray(np.array(self.timestep_map), jnp.float32)[t]
        if self.rescale_timesteps:
            mapped = mapped * (1000.0 / self.original_num_steps)
        return mapped


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """'ddimN' / [N] section respacing (diffusion.py:1223-1270)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with ddim stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += stride
        all_steps += taken
        start_idx += size
    return set(all_steps)
