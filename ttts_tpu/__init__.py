"""ttts_tpu — a TPU-native zero-shot TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``adelacvg/ttts`` stack (VALL-E-style GPT over VQ codes, VITS-style VQ-VAE-GAN
codec, latent-conditioned mel diffusion, Vocos ISTFT vocoder, CLVP reranker),
re-designed TPU-first: functional models, static shapes, one device mesh,
pjit/shard_map parallelism, Pallas kernels on the hot paths.

Layout:
  ops/       pure-JAX + Pallas DSP and compute primitives (STFT, mel, resample)
  text/      host-side text frontend (pinyin, BPE tokenizer)
  models/    flax.linen model definitions (codec, gpt, diffusion net, vocos, clvp)
  diffusion/ Gaussian diffusion engine + DPM-Solver++ samplers as lax.scan
  parallel/  mesh construction and sharding rules
  train/     optax trainers, train states, checkpointing
  data/      host-side data pipeline (jsonl manifests, sidecars, bucketing)
  native/    C++ host runtime (audio IO / DSP) exposed via ctypes
"""

__version__ = "0.1.0"
