"""Codec reconstruction check (reference ttts/vqvae/eval.py): load the latest
generator checkpoint, reconstruct one wav through the full infer path, write
`gen.wav`.

usage: python -m ttts_tpu.eval_codec --ckpt logs/ckpt --wav in.wav [--out gen.wav]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import default_config, load_config
from ttts_tpu.data.audio import load_wav, save_wav
from ttts_tpu.infer_utils import load_model
from ttts_tpu.ops.mel import vits_spectrogram


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--wav", required=True)
    p.add_argument("--out", default="gen.wav")
    p.add_argument("--config", default=None)
    p.add_argument("--noise-scale", type=float, default=0.5)
    args = p.parse_args(argv)

    cfg = load_config(args.config) if args.config else default_config()
    a = cfg.audio
    model, variables = load_model("vqvae", args.ckpt, cfg)

    wav, _ = load_wav(args.wav, target_sr=a.sampling_rate)
    t = (len(wav) // a.hop_length) * a.hop_length
    wav = jnp.asarray(wav[:t])[None]
    spec = vits_spectrogram(wav, a.filter_length, a.hop_length, a.win_length)
    spec = spec.swapaxes(1, 2)
    text = jnp.zeros((1, 1), jnp.int32)  # unconditioned text

    out = model.apply(
        variables, wav[..., None], spec, jnp.asarray([spec.shape[1]]),
        text, jnp.asarray([1]), args.noise_scale,
        method=model.infer, rngs={"noise": jax.random.key(0)},
    )
    save_wav(args.out, np.asarray(out)[0, :, 0], a.sampling_rate)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
