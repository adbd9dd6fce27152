"""Jitted train steps for every model family.

One pure function per trainer, mirroring the reference loops:
  - GPT: ttts/gpt/train.py:89-136 — loss = 0.01·text + 1.0·mel.
  - Diffusion: ttts/diffusion/train.py:146-202 — frozen GPT produces latents
    inside the same jit program (:161-165), x_start = normalized mel, uniform
    timesteps, MSE+VLB.
  - VQ-VAE GAN: ttts/vqvae/train.py:313-459 — alternating D (LSGAN) and G
    (mel L1 ×45 + KL ×1 + feature-match + adv + commit) steps; the random
    20480-sample slice is decoded, and both real and fake slices go through
    the 32 kHz/128-mel loss mel.
  - CLVP: ttts/clvp/train.py — symmetric InfoNCE.
  - Classifier: ttts/classifier/train.py — CE with optional label smoothing.

All steps are shard-agnostic: under pjit with a batch-sharded input the
gradient mean is the implicit XLA collective (no DDP plumbing).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ttts_tpu.models.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from ttts_tpu.models.diffusion_net import normalize_tacotron_mel
from ttts_tpu.models.vqvae import slice_segments
from ttts_tpu.ops.mel import vits_mel_spectrogram
from ttts_tpu.train.state import TrainState, ema_update


# --------------------------------------------------------------------- GPT


def gpt_train_step(state: TrainState, batch: Dict[str, jax.Array], key,
                   model, text_weight: float = 0.01, mel_weight: float = 1.0):
    """batch: padded_text (B,Lt), text_lengths, padded_qmel (B,Lm), wav_lens."""

    def loss_fn(params):
        lt, lm, _ = model.apply(
            params,
            batch["text"], batch["text_lengths"], batch["mel_codes"], batch["wav_lengths"],
            deterministic=False,
            rngs={"dropout": key},
        )
        return text_weight * lt + mel_weight * lm, (lt, lm)

    (loss, (lt, lm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state, grad_norm, finite = apply_gradients_safe(state, grads)
    if state.ema_params is not None:
        # advance the EMA only when the optimizer actually applied — under
        # optax.MultiSteps only every accumulate_num-th micro-step updates
        # params; decaying the EMA on every micro-step would compound the
        # decay N× per real update (effective beta^N)
        advance = jnp.logical_and(finite, _optimizer_update_fired(new_state.opt_state))
        ema = ema_update(state.ema_params, new_state.params)
        ema = jax.tree_util.tree_map(
            lambda a, b: jnp.where(advance, a, b), ema, state.ema_params)
        new_state = new_state.replace(ema_params=ema)
    metrics = {
        "loss": loss, "loss_text": lt, "loss_mel": lm,
        "grad_norm": grad_norm, "nonfinite_skipped": 1.0 - finite,
    }
    return new_state, metrics


def _optimizer_update_fired(opt_state) -> jax.Array:
    """True when the step that produced `opt_state` applied the inner
    optimizer. Plain chains always apply; optax.MultiSteps applies only when
    its mini_step wrapped back to 0."""
    mini_step = getattr(opt_state, "mini_step", None)
    if mini_step is None:
        return jnp.asarray(True)
    return mini_step == 0


def optax_global_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree))
    )


def apply_gradients_safe(state: TrainState, grads):
    """Apply gradients only when they are finite (SURVEY §5.2: the reference
    has no systematic NaN/overflow guards — just a commented
    detect_anomaly, diffusion/train.py:155). A non-finite step is skipped
    in-jit (state passes through unchanged) and reported via the returned
    flag so the trainer can count/log it."""
    norm = optax_global_norm(grads)
    finite = jnp.isfinite(norm)
    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    new_state = state.apply_gradients(grads=safe_grads)
    merged = jax.tree_util.tree_map(
        lambda a, b: jnp.where(finite, a, b) if hasattr(a, "dtype") else a,
        new_state, state,
    )
    return merged, norm, finite


# ---------------------------------------------------------------- diffusion


def diffusion_train_step(state: TrainState, batch, key, model, diffuser,
                         gpt_model, gpt_params, unconditioned_percentage=0.1):
    """batch: text, mel (B,T,100), mel_refer (B,Tr,100), mel_codes, wav_lengths,
    text_lengths. Frozen-GPT latent production runs inside this jit program
    (diffusion/train.py:161-165)."""
    k_t, k_noise, k_uncond, k_drop, k_ld = jax.random.split(key, 5)

    latent = gpt_model.apply(
        gpt_params,
        batch["text"], batch["text_lengths"], batch["mel_codes"], batch["wav_lengths"],
        return_latent=True,
    )
    latent = jax.lax.stop_gradient(latent)

    x_start = normalize_tacotron_mel(batch["mel"])
    refer = normalize_tacotron_mel(batch["mel_refer"])
    b = x_start.shape[0]
    t = jax.random.randint(k_t, (b,), 0, diffuser.num_timesteps)

    def loss_fn(params):
        def model_fn(x, t_in, conditioning_free=False, **kw):
            return model.apply(
                params, x, t_in, latent, refer,
                conditioning_free=conditioning_free, train=True,
                unconditioned_percentage=unconditioned_percentage,
                rngs={"uncond": k_uncond, "layerdrop": k_ld, "dropout": k_drop},
            )

        losses = diffuser.training_losses(model_fn, x_start, t, k_noise)
        return jnp.mean(losses["loss"]), (jnp.mean(losses["mse"]), jnp.mean(losses["vb"]))

    (loss, (mse, vb)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state, grad_norm, finite = apply_gradients_safe(state, grads)
    return new_state, {"loss": loss, "mse": mse, "vb": vb,
                       "grad_norm": grad_norm,
                       "nonfinite_skipped": 1.0 - finite}


# ------------------------------------------------------------------- VQ-VAE


def vqvae_train_step(
    g_state: TrainState,
    d_state: TrainState,
    batch,
    key,
    generator,
    discriminator,
    audio_cfg,
    c_mel: float = 45.0,
    c_kl: float = 1.0,
    augment_cfg=None,
    device_warp: bool = False,
):
    """One alternating D/G step (vqvae/train.py:313-406).

    batch: wav (B,T,1), spec_lengths, text, text_lengths (+ optionally
    precomputed wav_aug/spec/spec_aug). The linear spectrograms — and, when
    `augment_cfg` is given, the NANSY parametric-EQ perturbation
    (vqvae/train.py:338) — are computed INSIDE this jit program: on-the-fly
    DSP rides the same compiled step instead of eager host dispatches. The
    generator's codebook lives in g_state.extra_vars['codebook']."""
    k_noise, k_slice, k_vq, k_drop, k_aug = jax.random.split(key, 5)
    hop = audio_cfg.hop_length
    seg_frames = generator.segment_frames

    a = audio_cfg
    from ttts_tpu.ops.mel import vits_spectrogram

    def spec_of(wav):
        return vits_spectrogram(
            wav[..., 0], a.filter_length, a.hop_length, a.win_length
        ).swapaxes(1, 2)

    batch = dict(batch)
    if "wav_aug" not in batch:
        # formant/pitch warp (the reference's praat stage): either supplied
        # by the host loader ('wav_warped', data/augment.py warp_batch_np)
        # or — default — computed HERE on device (warp_batch_device; the
        # host phase-vocoder can't feed the step, see bench_loader.py). The
        # parametric EQ then runs in-jit on top of it.
        aug_base = batch.pop("wav_warped", None)
        if aug_base is None:
            if device_warp and augment_cfg is not None:
                from ttts_tpu.data.augment import warp_batch_device

                k_aug, k_warp = jax.random.split(k_aug)
                aug_base = warp_batch_device(
                    k_warp, batch["wav"][..., 0], augment_cfg)[..., None]
            else:
                aug_base = batch["wav"]
        if augment_cfg is not None:
            from ttts_tpu.data.augment import apply_peq, sample_params

            p = sample_params(k_aug, batch["wav"].shape[0], augment_cfg)
            batch["wav_aug"] = apply_peq(
                aug_base[..., 0], p["quality_power"], p["gain"], augment_cfg
            )[..., None]
        else:
            batch["wav_aug"] = aug_base
    if "spec" not in batch:
        batch["spec"] = spec_of(batch["wav"])
    if "spec_aug" not in batch:
        batch["spec_aug"] = spec_of(batch["wav_aug"])

    # ---- ONE generator forward, shared by the D and G steps (the reference
    # also runs a single forward, vqvae/train.py:345-406). jax.vjp keeps the
    # residuals so the G gradient is pulled back through this same forward —
    # no duplicate forward, no reliance on XLA CSE. Differentiable outputs
    # are the vjp primal; ints/mutated collections ride along as aux.
    def gen_fwd(g_params):
        (y_hat, commit_loss, ids_slice, y_mask, stats, quantized), mut = (
            generator.apply(
                {"params": g_params, **g_state.extra_vars},
                batch["wav"], batch["wav_aug"], batch["spec"], batch["spec_aug"],
                batch["spec_lengths"], batch["text"], batch["text_lengths"],
                train=True,
                rngs={"noise": k_noise, "slice": k_slice, "vq": k_vq,
                      "dropout": k_drop},
                mutable=["codebook"],
            )
        )
        return (y_hat, commit_loss, y_mask, stats), (mut, ids_slice, quantized)

    diff_outs, gen_vjp, (new_extra, ids_slice, _) = jax.vjp(
        gen_fwd, g_state.params, has_aux=True
    )
    y_hat, commit_loss, y_mask, stats = diff_outs
    y_real = slice_segments(batch["wav"], ids_slice * hop, seg_frames * hop)

    # ---- discriminator step (fake detached)
    def d_loss_fn(d_params):
        yr, yg, _, _ = discriminator.apply(
            {"params": d_params}, y_real, jax.lax.stop_gradient(y_hat)
        )
        loss_disc, _, _ = discriminator_loss(yr, yg)
        return loss_disc

    loss_disc, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
    new_d_state = d_state.apply_gradients(grads=d_grads)

    # ---- generator step: grad wrt the forward's OUTPUTS, pulled back
    a = audio_cfg

    def mel_of(wav):
        return vits_mel_spectrogram(
            wav[..., 0], a.filter_length, a.n_mel_channels, a.sampling_rate,
            a.hop_length, a.win_length, a.mel_fmin, a.mel_fmax,
        )

    mel_real = mel_of(y_real)

    def g_loss_fn(outs):
        y_hat, commit_loss, y_mask, stats = outs
        z, z_p, m_p, logs_p, m_q, logs_q = stats
        # the G adversarial/fm losses see the UPDATED discriminator, matching
        # the reference's optimizer ordering (vqvae/train.py:378-406)
        yr, yg, fr, fg = discriminator.apply(
            {"params": new_d_state.params}, y_real, y_hat
        )
        loss_mel = jnp.mean(jnp.abs(mel_real - mel_of(y_hat))) * c_mel
        loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, y_mask) * c_kl
        loss_fm = feature_loss(fr, fg)
        loss_adv, _ = generator_loss(yg)
        total = loss_mel + loss_kl + loss_fm + loss_adv + commit_loss
        return total, (loss_mel, loss_kl, loss_fm, loss_adv, commit_loss)

    (loss_gen_all, (loss_mel, loss_kl_v, loss_fm, loss_adv, commit)), out_grads = (
        jax.value_and_grad(g_loss_fn, has_aux=True)(diff_outs)
    )
    (g_grads,) = gen_vjp(out_grads)
    new_g_state = g_state.apply_gradients(grads=g_grads)
    new_g_state = new_g_state.replace(extra_vars=dict(new_extra))

    metrics = {
        "loss_disc": loss_disc,
        "loss_gen_all": loss_gen_all,
        "loss_mel": loss_mel,
        "loss_kl": loss_kl_v,
        "loss_fm": loss_fm,
        "loss_adv": loss_adv,
        "commit_loss": commit,
    }
    return new_g_state, new_d_state, metrics


# --------------------------------------------------------------------- CLVP


def clvp_train_step(state: TrainState, batch, key, model):
    def loss_fn(params):
        return model.apply(
            params, batch["text"], batch["speech_tokens"], return_loss=True,
            train=True, rngs={"mask": key, "dropout": jax.random.fold_in(key, 1)},
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_state, grad_norm, finite = apply_gradients_safe(state, grads)
    return new_state, {"loss": loss, "grad_norm": grad_norm,
                       "nonfinite_skipped": 1.0 - finite}


# --------------------------------------------------------------- classifier


def classifier_train_step(state: TrainState, batch, key, model):
    def loss_fn(params):
        return model.apply(
            params, batch["mel"], labels=batch["labels"], deterministic=False,
            rngs={"dropout": key},
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads=grads)
    return new_state, {"loss": loss}
