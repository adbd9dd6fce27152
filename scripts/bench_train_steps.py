"""Training-step throughput + MFU for every trainer, at the documented
configs, on the default backend (the real chip under axon).

One truth for the training numbers (VERDICT r4 #5/#7): README's table,
docs/TRAINING.md and BENCH_DETAIL training rows should all be regenerated
from THIS script's output. FLOPs come from XLA's own cost analysis of the
compiled step (includes attention, convs, and the backward pass — not a
hand 6·P·tokens guess), against the v5e bf16 peak.

Timing: steady-state wall over --steps chained steps (state threaded
through; one final host fetch). Steps are 100s of ms, so the ~30-40 ms
tunnel dispatch floor amortizes and run-ahead keeps the chip busy —
this matches what a real train loop sustains.

    python scripts/bench_train_steps.py [--steps 8] [--only gpt]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16


def _cost_flops(jitted, *args):
    """XLA's flops estimate for the compiled program (None if unavailable)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--only", default=None)
    ap.add_argument("--gpt-probe", action="store_true",
                    help="also run the GPT batch-uplift probe rows "
                         "(b128 / b128+remat / b96)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(pathlib.Path(__file__).resolve().parent.parent
                              / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from ttts_tpu.config import default_config
    from ttts_tpu.train.state import TrainState, make_adamw, make_gan_adam

    cfg = default_config()
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend(), "steps": args.steps, "rows": []}

    def run(name, step, state, batch, key, tokens_per_step=None,
            audio_s_per_step=None, mel_frames_per_step=None, pairs_per_step=None,
            note=""):
        if args.only and args.only not in name:
            return
        t_c0 = time.time()
        flops = _cost_flops(step, state, batch, key)
        s, m = step(state, batch, key)
        jax.block_until_ready(m)
        compile_s = time.time() - t_c0
        # warm-up: the first post-compile step has been observed to stall
        # ~minutes through the tunnel (one-off HBM/defrag hiccup; steady
        # state right after is fine) — run two unmeasured steps first,
        # BLOCKING each so run-ahead never holds two steps' activations
        # live at once (the codec GAN step OOMs otherwise).
        for i in range(2):
            s, m = step(s, batch, jax.random.fold_in(key, 1000 + i))
            jax.block_until_ready(m)
        # per-step wall with a host fetch each step (what a logging train
        # loop sees; adds the ~35 ms tunnel floor) — MEDIAN of steps so a
        # single tunnel stall cannot poison the row.
        times = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            s, m = step(s, batch, jax.random.fold_in(key, i))
            np.asarray(m[next(iter(m))])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        row = {"name": name, "ms_per_step": round(dt * 1e3, 1),
               "compile_s": round(compile_s, 1), "note": note}
        if flops:
            row["flops_per_step"] = flops
            row["mfu"] = round(flops / dt / V5E_PEAK_FLOPS, 4)
        if tokens_per_step:
            row["tokens_per_sec"] = round(tokens_per_step / dt)
        if audio_s_per_step:
            row["audio_sec_per_sec"] = round(audio_s_per_step / dt, 1)
        if mel_frames_per_step:
            row["mel_frames_per_sec"] = round(mel_frames_per_step / dt)
        if pairs_per_step:
            row["pairs_per_sec"] = round(pairs_per_step / dt, 1)
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    # ---- GPT (README: batch 64, text 256 + mel 1536, flash, bf16) ---------
    if not args.only or "gpt" in args.only:
        from ttts_tpu.models.gpt import UnifiedVoice
        from ttts_tpu.train.steps import gpt_train_step

        import dataclasses
        gcfg = dataclasses.replace(cfg.gpt, flash_attention=True,
                                   attn_dropout=0.0)
        model = UnifiedVoice(gcfg, dtype=jnp.bfloat16)
        B, LT, LM = 64, 256, 1536
        batch = {
            "text": jnp.asarray(rng.integers(1, 255, size=(B, LT))),
            "text_lengths": jnp.asarray(rng.integers(LT // 2, LT, size=(B,))),
            "mel_codes": jnp.asarray(rng.integers(0, 1024, size=(B, LM))),
            "wav_lengths": jnp.asarray(
                rng.integers(LM // 2, LM, size=(B,))) * 1024,
        }
        params = jax.jit(model.init)(jax.random.key(0), batch["text"][:1],
                                     batch["text_lengths"][:1],
                                     batch["mel_codes"][:1],
                                     batch["wav_lengths"][:1])
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=make_adamw(1e-4, warmup_steps=1))
        step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
        # token accounting: the transformer runs B×(LT+LM+2+1) positions
        tokens = B * (LT + LM + 3)
        run("gpt_train(flash,b64,t256+m1536)", step, state, batch,
            jax.random.key(1), tokens_per_step=tokens,
            note="fwd+bwd+grad-norm; resid/embd dropout on, attn dropout off")

        # batch-uplift probe (VERDICT r4 #7): does a bigger per-chip batch
        # (with remat if HBM demands it) raise tokens/s at the same context?
        if args.gpt_probe:
            def make_batch(Bp):
                return {
                    "text": jnp.asarray(rng.integers(1, 255, size=(Bp, LT))),
                    "text_lengths": jnp.asarray(
                        rng.integers(LT // 2, LT, size=(Bp,))),
                    "mel_codes": jnp.asarray(
                        rng.integers(0, 1024, size=(Bp, LM))),
                    "wav_lengths": jnp.asarray(
                        rng.integers(LM // 2, LM, size=(Bp,))) * 1024,
                }
            for Bp, ckpt in ((128, True), (128, False), (96, False)):
                # GPT2Block names are remat-stable (gpt.py GPT2Stack), so the
                # b64 params are reusable for every probe row.
                pcfg = dataclasses.replace(gcfg, checkpointing=ckpt)
                pmodel = UnifiedVoice(pcfg, dtype=jnp.bfloat16)
                pstate = TrainState.create(apply_fn=pmodel.apply,
                                           params=params,
                                           tx=make_adamw(1e-4, warmup_steps=1))
                pstep = jax.jit(lambda s, b, k, m=pmodel: gpt_train_step(
                    s, b, k, m))
                try:
                    run(f"gpt_train(flash,b{Bp}{',remat' if ckpt else ''})",
                        pstep, pstate, make_batch(Bp), jax.random.key(1),
                        tokens_per_step=Bp * (LT + LM + 3),
                        note="batch-uplift probe vs the b64 row")
                except Exception as e:  # OOM at this batch is itself a result
                    row = {"name": f"gpt_train(flash,b{Bp}"
                                    f"{',remat' if ckpt else ''})",
                           "error": f"{type(e).__name__}: {str(e)[:400]}"}
                    out["rows"].append(row)
                    print(json.dumps(row), file=sys.stderr, flush=True)
                del pstate, pstep

    # ---- codec GAN (README: batch 16 × 8 s clips, full aug in-jit) --------
    if not args.only or "vqvae" in args.only or "gan" in args.only:
        from ttts_tpu.models.discriminator import MultiPeriodDiscriminator
        from ttts_tpu.models.vqvae import SynthesizerTrn
        from ttts_tpu.train.mains import make_vqvae_augment_cfg
        from ttts_tpu.train.steps import vqvae_train_step
        import functools

        a = cfg.audio
        B, frames = 16, 400  # 400 × 640 / 32000 = 8 s
        gen = SynthesizerTrn(cfg.vqvae, spec_channels=a.filter_length // 2 + 1,
                             segment_frames=cfg.train.segment_size // a.hop_length)
        disc = MultiPeriodDiscriminator()
        aug_cfg = make_vqvae_augment_cfg(cfg)
        wav = jnp.asarray(
            rng.standard_normal((B, frames * a.hop_length, 1)).astype(np.float32) * 0.1)
        batch = {"wav": wav, "spec_lengths": jnp.asarray([frames] * B),
                 "text": jnp.asarray(rng.integers(0, 255, size=(B, 24))),
                 "text_lengths": jnp.asarray([24] * B)}
        from ttts_tpu.ops.mel import vits_spectrogram
        spec0 = vits_spectrogram(wav[:1, :, 0], a.filter_length, a.hop_length,
                                 a.win_length).swapaxes(1, 2)
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "slice": jax.random.key(2), "vq": jax.random.key(3)}
        g_vars = jax.jit(functools.partial(gen.init, train=True))(
            rngs, wav[:1], wav[:1], spec0, spec0, jnp.asarray([frames]),
            batch["text"][:1], jnp.asarray([24]))
        seg = jnp.zeros((1, cfg.train.segment_size, 1))
        d_params = jax.jit(disc.init)(jax.random.key(4), seg, seg)["params"]
        g_state = TrainState.create(apply_fn=gen.apply, params=g_vars["params"],
                                    tx=make_gan_adam(2e-4),
                                    extra_vars={"codebook": g_vars["codebook"]})
        d_state = TrainState.create(apply_fn=disc.apply, params=d_params,
                                    tx=make_gan_adam(2e-4))
        inner = functools.partial(
            vqvae_train_step, generator=gen, discriminator=disc, audio_cfg=a,
            augment_cfg=aug_cfg, device_warp=True)

        def paired(stpair, b, k):
            g, d, m = inner(stpair["g"], stpair["d"], b, k)
            return {"g": g, "d": d}, m

        # donate like train/mains.py does: without aliasing, two copies of
        # the ~2 GB codec+MPD state coexist and the row OOMs
        run("vqvae_gan(b16,8s,warp+peq in-jit)",
            jax.jit(paired, donate_argnums=(0,)),
            {"g": g_state, "d": d_state}, batch, jax.random.key(7),
            audio_s_per_step=B * 8.0,
            note="alternating D/G, Pallas VQ, device NANSY warp + PEQ")

    # ---- diffusion (README: 768-frame mels, frozen GPT in-jit, batch 16) --
    if not args.only or "diffusion" in args.only:
        from ttts_tpu.diffusion.gaussian import (GaussianDiffusion,
                                                 get_named_beta_schedule)
        from ttts_tpu.models.diffusion_net import AA_diffusion
        from ttts_tpu.models.gpt import UnifiedVoice
        from ttts_tpu.train.steps import diffusion_train_step

        gpt = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16)
        net = AA_diffusion(cfg.diffusion_net, dtype=jnp.bfloat16)
        diffuser = GaussianDiffusion(
            get_named_beta_schedule(cfg.diffusion.noise_schedule,
                                    cfg.diffusion.trained_timesteps))
        B, T = 16, 768
        batch = {
            "text": jnp.asarray(rng.integers(1, 255, size=(B, 64))),
            "text_lengths": jnp.asarray([64] * B),
            "mel_codes": jnp.asarray(rng.integers(0, 1024, size=(B, T // 4))),
            "wav_lengths": jnp.asarray([T // 4] * B) * 1024,
            "mel": jnp.asarray(rng.standard_normal((B, T, 100)).astype(np.float32)),
            "mel_refer": jnp.asarray(
                rng.standard_normal((B, 200, 100)).astype(np.float32)),
        }
        gparams = jax.jit(gpt.init)(jax.random.key(0), batch["text"][:1],
                                    batch["text_lengths"][:1],
                                    batch["mel_codes"][:1],
                                    batch["wav_lengths"][:1])
        mel0 = jnp.zeros((1, 32, 100))
        lat0 = jnp.zeros((1, 16, cfg.diffusion_net.in_latent_channels))
        dparams = jax.jit(net.init)(jax.random.key(1), mel0, jnp.asarray([1.0]),
                                    lat0, mel0)
        state = TrainState.create(apply_fn=net.apply, params=dparams,
                                  tx=make_adamw(1e-4, warmup_steps=1))
        step = jax.jit(lambda s, b, k: diffusion_train_step(
            s, b, k, net, diffuser, gpt, gparams))
        run("diffusion_train(b16,T768,frozen-gpt)", step, state, batch,
            jax.random.key(2), mel_frames_per_step=B * T,
            note="bf16 activations; frozen GPT latent inside the jit")

    # ---- CLVP (README: batch 24, full 243 M model) -------------------------
    if not args.only or "clvp" in args.only:
        from ttts_tpu.models.clvp import CLVP
        from ttts_tpu.train.steps import clvp_train_step

        m = CLVP(cfg.clvp, dtype=jnp.bfloat16)
        B = 24
        b = {"text": jnp.asarray(rng.integers(0, 255, size=(B, cfg.clvp.text_seq_len))),
             "speech_tokens": jnp.asarray(
                 rng.integers(0, 8192, size=(B, cfg.clvp.speech_seq_len)))}
        p = jax.jit(m.init)(jax.random.key(0), b["text"][:1],
                            b["speech_tokens"][:1])
        st = TrainState.create(apply_fn=m.apply, params=p,
                               tx=make_adamw(1e-4, warmup_steps=1))
        # donate (like train/mains.py): the 275 M-param state is ~3.3 GB in
        # f32 params+Adam; two live copies exhaust HBM
        step = jax.jit(lambda s, bb, k: clvp_train_step(s, bb, k, m),
                       donate_argnums=(0,))
        run("clvp_train(b24,t350+s430,275M)", step, st, b, jax.random.key(1),
            pairs_per_step=B,
            note="global-batch InfoNCE, bf16 encoders; full padded context "
                 "(reference clvp/config.json seq lens)")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
