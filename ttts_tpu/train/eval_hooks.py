"""In-training perceptual eval hooks (SURVEY §4 'in-training eval hooks').

Rebuilds the reference's TensorBoard monitoring:
  - diffusion: every save_freq, run full cond-free DPM++(2M) sampling on one
    held-out batch, decode with Vocos, log audio + mel images
    (ttts/diffusion/train.py:213-247);
  - vqvae: log ground-truth/generated mel images and sample audio
    (ttts/vqvae/train.py:408-459).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.utils.logging import SummaryWriter, plot_spectrogram_to_numpy


def make_diffusion_eval_fn(
    net,
    gpt_model,
    gpt_params,
    vocos_model,
    vocos_params,
    eval_batch: Dict[str, np.ndarray],
    steps: int = 50,
    guidance_scale: float = 2.0,
    sample_rate: int = 24000,
):
    """Returns eval_fn(step, state, writer) for Trainer."""
    from ttts_tpu.diffusion.dpm import cfg_eps_fn, dpm_solver_pp_2m_sample
    from ttts_tpu.models.diffusion_net import (
        denormalize_tacotron_mel,
        normalize_tacotron_mel,
    )

    def eval_fn(step: int, state, writer: SummaryWriter):
        batch = {k: jnp.asarray(v[:1]) for k, v in eval_batch.items()}
        latent = gpt_model.apply(
            gpt_params, batch["text"], batch["text_lengths"],
            batch["mel_codes"], batch["wav_lengths"], return_latent=True,
        )
        refer = normalize_tacotron_mel(batch["mel_refer"])
        out_len = batch["mel"].shape[1]
        params = {"params": state.params["params"]} if "params" in state.params else state.params
        cond = net.apply(params, latent, refer, out_len,
                         method=net.timestep_independent)
        uncond_emb = params["params"]["unconditioned_embedding"]
        uncond = jnp.tile(uncond_emb, (1, out_len, 1))

        biases = net.apply(params, out_len, method=net.rel_biases)

        def trunk(x2, t2, emb2):
            return net.apply(params, x2, t2, emb2, rel_biases=biases,
                             method=net.trunk)

        eps_fn = cfg_eps_fn(trunk, cond, uncond, guidance_scale)
        noise = jax.random.normal(jax.random.key(step), (1, out_len, batch["mel"].shape[-1]))
        mel = denormalize_tacotron_mel(dpm_solver_pp_2m_sample(eps_fn, noise, steps=steps))
        wav = vocos_model.apply(vocos_params, mel)

        writer.summarize(
            step,
            images={
                "eval/mel_generated": plot_spectrogram_to_numpy(np.asarray(mel[0]).T),
                "eval/mel_target": plot_spectrogram_to_numpy(np.asarray(batch["mel"][0]).T),
            },
            audios={"eval/sample": np.asarray(wav[0])},
            audio_sampling_rate=sample_rate,
        )

    return eval_fn


def make_vqvae_eval_fn(audio_cfg, sample_rate: int = 32000):
    """Returns eval_fn(step, state_dict, writer) logging mel images of the
    latest generated slice (vqvae/train.py:419-459 monitoring)."""
    from ttts_tpu.ops.mel import vits_mel_spectrogram

    def eval_fn(step: int, state, writer: SummaryWriter, y_real=None, y_hat=None):
        if y_real is None or y_hat is None:
            return
        a = audio_cfg
        mel_r = vits_mel_spectrogram(jnp.asarray(y_real)[..., 0], a.filter_length,
                                     a.n_mel_channels, a.sampling_rate, a.hop_length,
                                     a.win_length)
        mel_g = vits_mel_spectrogram(jnp.asarray(y_hat)[..., 0], a.filter_length,
                                     a.n_mel_channels, a.sampling_rate, a.hop_length,
                                     a.win_length)
        writer.summarize(
            step,
            images={
                "eval/slice_mel_real": plot_spectrogram_to_numpy(np.asarray(mel_r[0])),
                "eval/slice_mel_gen": plot_spectrogram_to_numpy(np.asarray(mel_g[0])),
            },
            audios={"eval/slice_real": np.asarray(y_real[0, :, 0]),
                    "eval/slice_gen": np.asarray(y_hat[0, :, 0])},
            audio_sampling_rate=sample_rate,
        )

    return eval_fn
