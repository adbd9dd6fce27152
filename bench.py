"""Benchmark: VALL-E GPT zero-shot AR decode with static KV cache
(BASELINE config 3 — the main tokens/sec metric).

Runs the flagship UnifiedVoice at the reference v2 config
(ttts/gpt/config.json: 6 layers × 512 dim × 8 heads, 1026-code vocab) and
measures autoregressive mel-code throughput on the available chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured-RTF-budget utilisation against the driver's north
star (RTF < 0.05/chip): generated codes are 25 Hz semantic frames, so
tokens/sec / 25 = ×realtime; vs_baseline = (tokens_per_sec/25) * 0.05 (>1
beats the target).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ttts_tpu.config import GPTConfig
    from ttts_tpu.models.gpt import (
        UnifiedVoice,
        cast_params_for_inference,
        inference_speech,
    )
    from ttts_tpu.models.sampling import SamplingParams

    import jax.numpy as jnp

    cfg = GPTConfig()
    model = UnifiedVoice(cfg, dtype=jnp.bfloat16)  # bf16 activations on MXU

    b, lt, lp, gen_len = 8, 64, 50, 200
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 255, size=(b, lt)))
    prompt = jnp.asarray(rng.integers(0, 1024, size=(b, lp)))
    dummy_codes = jnp.asarray(rng.integers(0, 1024, size=(b, 16)))
    params = model.init(
        jax.random.key(0), text, jnp.full((b,), lt), dummy_codes, jnp.full((b,), 16 * 1024)
    )
    params = cast_params_for_inference(params)

    run = jax.jit(
        lambda p, t, c, k: inference_speech(
            model, p, t, c, k, max_generate_length=gen_len,
            sampling=SamplingParams(top_p=0.8, temperature=0.8, repetition_penalty=2.0),
        )
    )

    # warmup / compile (np.asarray forces a full device round-trip — the
    # experimental axon tunnel can report ready before execution completes)
    np.asarray(run(params, text, prompt, jax.random.key(1)))

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(run(params, text, prompt, jax.random.key(2 + i)))
    dt = (time.perf_counter() - t0) / iters

    tokens_per_sec = b * gen_len / dt
    # 25 Hz semantic code rate (ttts/vqvae/config.json semantic_frame_rate)
    realtime_factor = tokens_per_sec / 25.0
    vs_baseline = realtime_factor * 0.05  # >1 == beats RTF<0.05 north star

    print(json.dumps({
        "metric": "gpt_ar_decode_tokens_per_sec",
        "value": round(tokens_per_sec, 2),
        "unit": "mel-codes/s (batch 8, 6L×512d KV-cache decode)",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
