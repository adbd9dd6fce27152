"""GPT AR-decode step attribution (VERDICT r2 next #4).

Config 3 decodes at ~480 us/step (batch 8) against a ~52 us weight-read
bound (21.5M params bf16 at 819 GB/s) — MBU ~11%, so the step is
overhead-bound, not bandwidth-bound. This script splits the step into its
three serial pieces and times each as its own compiled loop on the default
backend (the real chip under axon):

  model_only   — decode_one in a lax.scan with a FIXED token (no sampling,
                 no repetition counts): the transformer + cache cost.
  sample_only  — sample_logits + counts update in a lax.scan over fixed
                 logits: the warper/sort cost.
  full         — inference_speech as served (scan, early_stop=False).
  prefill      — one prefill call (amortized over the 200 steps).

    python scripts/bench_gpt_decode.py [--batch 8] [--gen 200] [--iters 5]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _timeit(fn, iters):
    fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gen", type=int, default=200)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ttts_tpu.api import TextToSpeech
    from ttts_tpu.config import default_config
    from ttts_tpu.models.gpt import inference_speech
    from ttts_tpu.models.sampling import SamplingParams, sample_logits

    tts = TextToSpeech(default_config(), seed=0, init_stages=("gpt",))
    model = tts.gpt
    params = tts._serve_params("gpt")
    c = tts.cfg.gpt

    rng = np.random.default_rng(0)
    b, gen = args.batch, args.gen
    text = jnp.asarray(rng.integers(1, 255, size=(b, 64)))
    prompt = jnp.asarray(rng.integers(0, 1024, size=(b, 48)))
    prefix_len = text.shape[1] + 2 + prompt.shape[1] + 1
    max_len = prefix_len + gen

    # ---- full serving loop -------------------------------------------------
    full = jax.jit(lambda p, k: inference_speech(
        model, p, text, prompt, k, gen, early_stop=False))
    dt_full = _timeit(lambda: np.asarray(full(params, jax.random.key(1))),
                      args.iters)

    # ---- prefill alone -----------------------------------------------------
    prefill = jax.jit(lambda p: model.apply(
        p, text, prompt, max_len, method=model.prefill)[1])
    dt_prefill = _timeit(lambda: np.asarray(prefill(params)), args.iters)

    # ---- model-only: decode_one scan, fixed token --------------------------
    def model_only(p):
        cache, logits, _, mel_off = model.apply(
            p, text, prompt, max_len, method=model.prefill)
        tok0 = jnp.zeros((b,), jnp.int32)

        def step(carry, i):
            cache, logits = carry
            logits, cache = model.apply(
                p, tok0, cache, prefix_len + i, mel_off + i, max_len,
                method=model.decode_one)
            return (cache, logits), logits[:, 0]

        (_, logits), out = jax.lax.scan(step, (cache, logits), jnp.arange(gen))
        return out

    model_only_j = jax.jit(model_only)
    dt_model = _timeit(lambda: np.asarray(model_only_j(params)), args.iters)

    # ---- sample-only: warpers + counts scan over fixed logits --------------
    logits0 = jnp.asarray(rng.standard_normal((b, c.number_mel_codes)).astype(np.float32))

    def sample_only(key):
        counts0 = jnp.zeros((b, c.number_mel_codes), jnp.int32)
        # pre-split like the serving loop — an in-scan jax.random.split costs
        # ~145 us/step on TPU and would mis-attribute RNG cost to the warpers
        step_keys = jax.random.split(key, gen)

        def step(counts, xs):
            i, sk = xs
            tok = sample_logits(sk, logits0, counts, SamplingParams())
            counts = counts.at[jnp.arange(b), tok].add(1)
            return counts, tok

        _, toks = jax.lax.scan(step, counts0, (jnp.arange(gen), step_keys))
        return toks

    sample_only_j = jax.jit(sample_only)
    dt_sample = _timeit(lambda: np.asarray(sample_only_j(jax.random.key(1))),
                        args.iters)

    res = {
        "backend": jax.default_backend(),
        "batch": b, "gen_len": gen, "max_len": int(max_len),
        "full_ms": round(dt_full * 1e3, 2),
        "prefill_ms": round(dt_prefill * 1e3, 2),
        "model_only_ms": round(dt_model * 1e3, 2),
        "sample_only_ms": round(dt_sample * 1e3, 2),
        "tokens_per_sec_full": round(b * gen / dt_full, 1),
        "us_per_step_full": round(dt_full / gen * 1e6, 1),
        "us_per_step_model": round((dt_model - dt_prefill) / gen * 1e6, 1),
        "us_per_step_sample": round(dt_sample / gen * 1e6, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
