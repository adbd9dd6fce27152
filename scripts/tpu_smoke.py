"""TPU smoke: run every train step + the serving pipeline ON THE DEFAULT
BACKEND (the real chip under axon) at small-but-real sizes.

The CPU test suite (tests/conftest.py forces jax_platforms=cpu) cannot reach
TPU-gated code: the Pallas VQ nearest-neighbour route (quantize.py _on_tpu,
engaged when N·bins ≥ 2^16), the Pallas flash-attention routes, and the bf16
serving-weight cast. This script trips all of them inside real grad traces —
it is how the pallas_call-has-no-JVP crash (quantize.py:146) was found.

usage:  timeout 1500 python scripts/tpu_smoke.py      # ~8-10 min of compiles
        python scripts/tpu_smoke.py --only serving    # substring stage filter
        python scripts/tpu_smoke.py --recipe          # adds the 5-stage CLI recipe
        python scripts/tpu_smoke.py --converge        # adds the convergence replays
                                                      # (tests/test_convergence.py on chip)
Prints one PASS/FAIL line per surface (SKIP for filtered-out stages); exits
nonzero on any failure. Under tunnel load a full run can exceed 25 min —
use --only to re-verify just the touched surface.
"""

import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ttts_tpu.config import (
        AudioConfig,
        CLVPConfig,
        DiffusionNetConfig,
        GPTConfig,
        VQVAEConfig,
    )
    from ttts_tpu.train.state import TrainState, make_adamw, make_gan_adam

    rng = np.random.default_rng(0)
    failures = []

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    def check(name, fn):
        if only is not None and only not in name:
            print(f"SKIP {name}", flush=True)
            return
        try:
            fn()
            print(f"PASS {name}", flush=True)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            traceback.print_exc(limit=3)

    # ---- GPT train step (flash on, attn_dropout 0 → Pallas fwd+bwd) -------
    def gpt_step():
        from ttts_tpu.models.gpt import UnifiedVoice
        from ttts_tpu.train.steps import gpt_train_step

        cfg = GPTConfig(model_dim=256, layers=2, heads=4, max_text_tokens=800,
                        max_mel_tokens=1200, number_mel_codes=1026,
                        start_mel_token=1024, stop_mel_token=1025,
                        attn_dropout=0.0, flash_attention=True)
        model = UnifiedVoice(cfg, dtype=jnp.bfloat16)
        batch = {
            "text": jnp.asarray(rng.integers(1, 255, size=(2, 64))),
            "text_lengths": jnp.asarray([64, 50]),
            "mel_codes": jnp.asarray(rng.integers(0, 1024, size=(2, 1024))),
            "wav_lengths": jnp.asarray([1024, 900]) * 1024,
        }
        params = jax.jit(model.init)(jax.random.key(0), batch["text"],
                                     batch["text_lengths"], batch["mel_codes"],
                                     batch["wav_lengths"])
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=make_adamw(1e-4, warmup_steps=1))
        step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
        _, m = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))

    check("gpt_train_step(flash)", gpt_step)

    # ---- codec GAN step (Pallas VQ kernel inside value_and_grad) ----------
    def gan_step():
        from ttts_tpu.models.discriminator import MultiPeriodDiscriminator
        from ttts_tpu.models.vqvae import SynthesizerTrn
        from ttts_tpu.train.steps import vqvae_train_step

        audio = AudioConfig()
        hop = audio.hop_length
        # 128 frames × 1024 bins = 2^17 ≥ the Pallas-VQ engage threshold
        frames, B = 128, 2
        vq = VQVAEConfig(posterior_wn_layers=2, flow_layers=1, flow_wn_layers=1)
        gen = SynthesizerTrn(vq, spec_channels=audio.filter_length // 2 + 1,
                             segment_frames=16)
        disc = MultiPeriodDiscriminator(periods=(2, 3))
        wav = jnp.asarray(
            rng.standard_normal((B, frames * hop, 1)).astype(np.float32) * 0.1)
        spec = jnp.asarray(rng.standard_normal(
            (B, frames, audio.filter_length // 2 + 1)).astype(np.float32))
        batch = {"wav": wav, "spec_lengths": jnp.asarray([frames] * B),
                 "text": jnp.asarray(rng.integers(0, 255, size=(B, 12))),
                 "text_lengths": jnp.asarray([12] * B)}
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "slice": jax.random.key(2), "vq": jax.random.key(3)}
        g_vars = jax.jit(lambda: gen.init(
            rngs, wav[:1], wav[:1], spec[:1], spec[:1], jnp.asarray([frames]),
            batch["text"][:1], jnp.asarray([12]), train=True))()
        seg = jnp.zeros((1, 16 * hop, 1))
        d_params = jax.jit(lambda: disc.init(jax.random.key(4), seg, seg))()["params"]
        g_state = TrainState.create(apply_fn=gen.apply, params=g_vars["params"],
                                    tx=make_gan_adam(2e-4),
                                    extra_vars={"codebook": g_vars["codebook"]})
        d_state = TrainState.create(apply_fn=disc.apply, params=d_params,
                                    tx=make_gan_adam(2e-4))
        step = jax.jit(lambda g, d, b, k: vqvae_train_step(g, d, b, k, gen,
                                                           disc, audio))
        g2, d2, m = step(g_state, d_state, batch, jax.random.key(7))
        assert np.isfinite(float(m["loss_gen_all"]))
        assert bool(g2.extra_vars["codebook"]["quantizer"]["state"].inited)

    check("vqvae_gan_step(pallas-vq)", gan_step)

    # ---- diffusion step with frozen GPT -----------------------------------
    def diff_step():
        from ttts_tpu.diffusion.gaussian import (
            GaussianDiffusion,
            get_named_beta_schedule,
        )
        from ttts_tpu.models.diffusion_net import AA_diffusion
        from ttts_tpu.models.gpt import UnifiedVoice
        from ttts_tpu.train.steps import diffusion_train_step

        gcfg = GPTConfig(model_dim=256, layers=1, heads=4, max_text_tokens=64,
                         max_mel_tokens=256, number_mel_codes=1026,
                         start_mel_token=1024, stop_mel_token=1025)
        gpt = UnifiedVoice(gcfg, dtype=jnp.bfloat16)
        dcfg = DiffusionNetConfig(model_channels=128, num_layers=2,
                                  in_latent_channels=256)
        net = AA_diffusion(dcfg)
        diffuser = GaussianDiffusion(get_named_beta_schedule("linear", 1000))
        B, T = 2, 128
        batch = {
            "text": jnp.asarray(rng.integers(1, 255, size=(B, 16))),
            "text_lengths": jnp.asarray([16] * B),
            "mel_codes": jnp.asarray(rng.integers(0, 1024, size=(B, T // 4))),
            "wav_lengths": jnp.asarray([T // 4] * B) * 1024,
            "mel": jnp.asarray(rng.standard_normal((B, T, 100)).astype(np.float32)),
            "mel_refer": jnp.asarray(rng.standard_normal((B, 47, 100)).astype(np.float32)),
        }
        gparams = jax.jit(gpt.init)(jax.random.key(0), batch["text"],
                                    batch["text_lengths"], batch["mel_codes"],
                                    batch["wav_lengths"])
        mel0 = jnp.zeros((1, 32, 100))
        lat0 = jnp.zeros((1, 16, dcfg.in_latent_channels))
        dparams = jax.jit(net.init)(jax.random.key(1), mel0, jnp.asarray([1.0]),
                                    lat0, mel0)
        state = TrainState.create(apply_fn=net.apply, params=dparams,
                                  tx=make_adamw(1e-4, warmup_steps=1))
        step = jax.jit(lambda s, b, k: diffusion_train_step(
            s, b, k, net, diffuser, gpt, gparams))
        _, m = step(state, batch, jax.random.key(2))
        assert np.isfinite(float(m["loss"]))

    check("diffusion_train_step(frozen-gpt)", diff_step)

    # ---- CLVP + classifier steps ------------------------------------------
    def clvp_step():
        from ttts_tpu.models.clvp import CLVP
        from ttts_tpu.train.steps import clvp_train_step

        cfg = CLVPConfig(dim_text=64, dim_speech=64, dim_latent=32,
                         num_text_tokens=256, num_speech_tokens=1026,
                         text_enc_depth=1, speech_enc_depth=1, text_heads=2,
                         speech_heads=2)
        m = CLVP(cfg)
        b = {"text": jnp.asarray(rng.integers(0, 255, size=(4, 24))),
             "speech_tokens": jnp.asarray(rng.integers(0, 1024, size=(4, 50)))}
        p = jax.jit(m.init)(jax.random.key(0), b["text"], b["speech_tokens"])
        st = TrainState.create(apply_fn=m.apply, params=p,
                               tx=make_adamw(1e-4, warmup_steps=1))
        step = jax.jit(lambda s, bb, k: clvp_train_step(s, bb, k, m))
        _, mm = step(st, b, jax.random.key(1))
        assert np.isfinite(float(mm["loss"]))

    check("clvp_train_step", clvp_step)

    def classifier_step():
        from ttts_tpu.config import ClassifierConfig
        from ttts_tpu.models.classifier import AudioMiniEncoderWithClassifierHead
        from ttts_tpu.train.steps import classifier_train_step

        m = AudioMiniEncoderWithClassifierHead(ClassifierConfig(
            spec_dim=16, embedding_dim=64, depth=2, resnet_blocks=1,
            attn_blocks=2, base_channels=8))
        b = {"mel": jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32)),
             "labels": jnp.asarray([0, 1])}
        p = jax.jit(m.init)(jax.random.key(0), b["mel"])
        st = TrainState.create(apply_fn=m.apply, params=p,
                               tx=make_adamw(1e-4, warmup_steps=1))
        step = jax.jit(lambda s, bb, k: classifier_train_step(s, bb, k, m))
        _, mm = step(st, b, jax.random.key(1))
        assert np.isfinite(float(mm["loss"]))

    check("classifier_train_step", classifier_step)

    # ---- RVQ1 extract + decode (third consumer of the Pallas-VQ route) ----
    def rvq1_extract():
        from ttts_tpu.models.rvq1 import RVQ1

        m = RVQ1(spec_channels=65, hubert_channels=64, inter_channels=16,
                 dim=16, upsample_initial_channel=32, gin_channels=32,
                 segment_frames=4, codebook_bins=1024)
        # 2 × 128-frame clips → flat N 128 × 1024 bins ≥ the kernel gate
        spec = jnp.asarray(
            rng.standard_normal((2, 128, 65)).astype(np.float32))
        hubert = jnp.asarray(
            rng.standard_normal((2, 128, 64)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "slice": jax.random.key(2), "vq": jax.random.key(3)}
        variables = jax.jit(
            lambda: m.init(rngs, spec, hubert, train=True))()
        codes = jax.jit(
            lambda v, s: m.apply(v, s, method=m.extract_code))(variables, spec)
        wav = m.apply(variables, jnp.transpose(codes, (1, 0, 2)), spec,
                      method=m.decode, rngs={"noise": jax.random.key(7)})
        assert np.isfinite(np.asarray(wav)).all()

    check("rvq1_extract_decode(pallas-vq)", rvq1_extract)

    # ---- DVAE grad step (second consumer of the Pallas-VQ route) ----------
    def dvae_step():
        import optax

        from ttts_tpu.models.dvae import DiscreteVAE

        # bins 1024 × flat N 128 = 2^17 ≥ the Pallas-VQ engage threshold,
        # inside value_and_grad (the crash class quantize.py:146 guards)
        m = DiscreteVAE(num_tokens=1024, codebook_dim=64, channels=16,
                        out_channels=16, hidden_dim=16, num_layers=2)
        mel = jnp.asarray(
            rng.standard_normal((2, 256, 16)).astype(np.float32))
        variables = m.init({"params": jax.random.key(0),
                            "vq": jax.random.key(1)}, mel, train=True)
        params, codebook = variables["params"], variables["codebook"]

        @jax.jit
        def step(params, codebook):
            def loss_fn(p):
                (recon, commit, _), mut = m.apply(
                    {"params": p, "codebook": codebook}, mel, train=True,
                    rngs={"vq": jax.random.key(2)}, mutable=["codebook"])
                return recon + commit, mut

            (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, optax.global_norm(grads), mut["codebook"]

        loss, gn, _ = step(params, codebook)
        assert np.isfinite(float(loss)) and np.isfinite(float(gn))

    check("dvae_grad_step(pallas-vq)", dvae_step)

    # ---- fused decode-attention kernel vs packed-layout XLA reference ------
    def decode_attention_kernel():
        from ttts_tpu.ops.pallas.decode_attention import (
            decode_attention,
            decode_attention_reference,
            _pick_blk,
        )

        bf = jnp.bfloat16
        for ml, dk, bh, pos in ((256, 64, 128, 0), (512, 64, 128, 511),
                                (512, 64, 256, 300)):  # 3rd: adaptive blk=64
            assert _pick_blk(ml, dk, bh, 2, 128) is not None
            q = jnp.asarray(rng.standard_normal((dk, bh)), bf)
            u = jnp.asarray(rng.standard_normal((1, dk, bh)), bf)
            kc = jnp.asarray(rng.standard_normal((ml, dk, bh)), bf)
            vc = jnp.asarray(rng.standard_normal((ml, dk, bh)), bf)
            o1, k1, v1 = decode_attention(q, u, u, kc, vc, pos)
            o2, k2, v2 = decode_attention_reference(q, u, u, kc, vc, pos)
            err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                        - o2.astype(jnp.float32))))
            assert err < 0.05, f"kernel mismatch {err} at {(ml, dk, bh, pos)}"
            assert bool(jnp.all(k1 == k2)) and bool(jnp.all(v1 == v2))

    check("decode_attention_kernel", decode_attention_kernel)

    # ---- serving (bf16 weight cast + fused conditioning + flash routing) --
    def serving():
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
        from test_api import TINY

        from ttts_tpu.api import TextToSpeech

        tts = TextToSpeech(TINY, seed=0)
        voice = (rng.standard_normal(32000) * 0.1).astype(np.float32)
        wav = tts.tts("ni3 hao3 shi4 jie4", voice, 32000, preset="ultra_fast",
                      max_generate_length=32)
        assert wav.shape[0] > 500 and np.isfinite(wav).all()

    check("serving_tts(bf16+fused-cond)", serving)

    # ---- five-stage recipe on the chip (train→extract→train→serve through
    # the real CLIs; --recipe flag since it adds ~10 min of compiles) -------
    if "--recipe" in sys.argv:
        def recipe():
            import tempfile

            sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
            from test_five_stage_recipe import run_recipe

            with tempfile.TemporaryDirectory() as d:
                out = run_recipe(pathlib.Path(d))
                assert np.isfinite(out["wav"]).all()

        check("five_stage_recipe(cli-train->serve)", recipe)

    # ---- convergence replays on the chip (tests/test_convergence.py runners;
    # --converge flag: each is a few hundred jitted-scan steps, ~1 dispatch
    # per family but real compile time) ------------------------------------
    if "--converge" in sys.argv:
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
        import test_convergence as tc

        def _conv(name, runner, ok):
            def run():
                r = runner()
                print(f"  {name}: {r}", flush=True)
                assert ok(r), r

            check(f"converge_{name}", run)

        _conv("gpt", tc.converge_gpt, lambda r: r["mel_ce_final"] < 0.15)
        _conv("clvp", tc.converge_clvp, lambda r: r["loss_final"] < 0.3)
        _conv("classifier", tc.converge_classifier,
              lambda r: r["loss_final"] < 0.2)
        _conv("vqvae", tc.converge_vqvae,
              lambda r: (r["mel_l1_final"] < r["mel_l1_start"] * 0.7
                         and r["snr_db_final"] > r["snr_db_step0"] + 1.0))
        _conv("diffusion", tc.converge_diffusion,
              lambda r: (r["loss_final"] < r["loss_start"] * 0.7
                         and r["sample_mse_final"] < r["sample_mse_step0"] * 0.8))

    print(("ALL PASS" if not failures else f"FAILURES: {failures}"), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
