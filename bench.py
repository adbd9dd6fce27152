"""Benchmark suite: the five BASELINE.md configs at reference defaults.

Headline (the ONE stdout JSON line the driver records): end-to-end zero-shot
TTS RTF per chip at the REFERENCE inference contract — codec prompt extract
in the measured path, 4 AR candidates, CLVP rerank, 50-step DPM++(2M)
cond-free k=2 (ttts/diffusion/train.py:97-99, demo.ipynb cell 11), Vocos.
North star: RTF < 0.05 per v5e chip; vs_baseline = 0.05 / RTF.

The full table (all five configs + serving-tuned rows + per-stage
throughput/MFU estimates) goes to stderr and BENCH_DETAIL.json:
  0. tunnel dispatch floor
  5. full serving pipeline (headline, printed as early as possible) and the
     serving variants 5b (tuned) / 5c (batched) / 5d (batched tuned) /
     5e (sustained pipelined)
  1. codec mel+VQ encode/decode roundtrip on tests/assets/0.wav
  2. batched VQ extraction (the 2_save_vq_to_disk.py artifact path)
  3. GPT KV-cache AR decode tokens/sec
  4. diffusion DPM++2M(50) + Vocos decode (plus Vocos-only mel-frames/sec)
  6. host loader throughput

Operational discipline (round-4 lesson: the recorded run timed out, rc=124):
 - persistent XLA compile cache at .jax_cache — a warm re-run skips all
   tunnel compiles (measured 105 s → 1 s on a probe program);
 - the headline row runs FIRST after the floor row, so the driver's number
   lands within minutes even on a cold cache;
 - a soft wall-clock budget (BENCH_BUDGET_S, default 1050 s) skips the
   optional tail rows (1-4c, 6) rather than letting an outer timeout kill
   the process — every skip is recorded as a row with a note, and 5b-5e are
   never skipped (they follow the headline immediately).

MFU is an estimate: FLOPs ≈ 2·params·positions per forward (dense-dominated
nets), against the v5e bf16 peak (197 TFLOP/s). Falls back to the GPT
decode-throughput metric if the full pipeline cannot run here.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16
ASSET = pathlib.Path(__file__).parent / "tests" / "assets" / "0.wav"
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1050"))
_T0 = time.time()


def _elapsed():
    return time.time() - _T0


def _note(msg):
    print(f"[bench +{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def _param_count(tree):
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def _timeit(fn, iters=5):
    """Median of per-iteration wall times. The axon tunnel adds occasional
    multi-hundred-ms stalls to individual dispatches; a mean lets one stall
    move the headline RTF by 10-20% run-to-run, the median does not."""
    fn()  # compile / warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_all():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: cold bench walls are ~all XLA compiles
    # through the chip tunnel; the cache makes driver re-runs and local
    # iteration near-instant (same mechanism as __graft_entry__ dryrun)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(pathlib.Path(__file__).parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from ttts_tpu.api import TextToSpeech
    from ttts_tpu.config import default_config
    from ttts_tpu.data.audio import load_wav

    rows = []
    tts = TextToSpeech(default_config(), seed=0)
    rng = np.random.default_rng(0)
    n_params = {k: _param_count(v) for k, v in tts.params.items()}
    _note(f"init done; params(M): "
          + ", ".join(f"{k}={v / 1e6:.1f}" for k, v in n_params.items()))

    # ---- config 0: per-dispatch floor of the axon tunnel -------------------
    # Every host-synced call below pays one device round-trip; through the
    # remote-chip tunnel that floor is tens of ms (a local TPU host would be
    # ~0.1 ms). Recording it lets a reader subtract the harness artifact:
    # e.g. an N-dispatch pipeline carries N x floor of non-model latency.
    _triv = jax.jit(lambda x: x + 1.0)
    floor_dt = _timeit(lambda: np.asarray(_triv(jnp.float32(0))), iters=7)
    rows.append({"config": "0_dispatch_floor_ms",
                 "wall_ms": round(floor_dt * 1e3, 2),
                 "note": "trivial jit scalar round-trip; pure tunnel/dispatch "
                         "latency every host-synced row below also contains"})
    _note("config 0 done")

    voice, sr = load_wav(ASSET, target_sr=32000)
    voice = voice[: 4 * 32000]  # 4 s prompt

    # ---- config 5: full serving pipeline (headline, reference defaults) ----
    # runs FIRST so the driver's stdout line survives any outer timeout
    text = "ni3 hao3 shi4 jie4 jin1 tian1 tian1 qi4 zhen1 hao3 wo3 men5 chu1 qu4 wan2"

    def full(seed):
        w = tts.tts(text, voice, 32000, preset="fast", max_generate_length=256,
                    seed=seed)
        return w

    w0 = full(0)
    # fixed seed → stable code bucket; audio seconds from the actual output
    audio5 = len(w0) / 24000.0
    dt5 = _timeit(lambda: full(0), iters=5)
    rtf5 = dt5 / audio5
    rows.append({"config": "5_full_pipeline_reference_defaults",
                 "rtf": round(rtf5, 5), "wall_s": round(dt5, 4),
                 "audio_s": round(audio5, 3),
                 "note": "codec extract + 4 AR candidates + CLVP rerank + DPM++2M(50) k=2 + Vocos"})

    # emit the driver's headline line NOW — the remaining rows add minutes of
    # compiles on a cold cache, and the headline must survive an outer
    # timeout killing the tail of the run
    headline = {
        "metric": "e2e_tts_rtf_per_chip",
        "value": round(rtf5, 4),
        "unit": "wall-sec per audio-sec (reference defaults: codec extract + GPT 4-cand + CLVP + DPM++2M(50) + Vocos)",
        "vs_baseline": round(0.05 / rtf5, 3),
    }
    print(json.dumps(headline), flush=True)
    global _HEADLINE_PRINTED
    _HEADLINE_PRINTED = True
    _write_detail(rows, n_params)  # partial snapshot
    _note(f"config 5 done — headline rtf={rtf5:.4f} printed")

    # serving-tuned row (round-1 configuration: 1 candidate, 30 steps)
    def tuned(seed):
        return tts.tts(text, voice, 32000, preset="ultra_fast",
                       max_generate_length=256, seed=seed,
                       voice_cache_key="v")  # conditioning cached

    w1 = tuned(0)
    audio6 = len(w1) / 24000.0
    dt6 = _timeit(lambda: tuned(0), iters=3)
    rows.append({"config": "5b_serving_tuned", "rtf": round(dt6 / audio6, 5),
                 "wall_s": round(dt6, 4), "audio_s": round(audio6, 3),
                 "note": "1 AR candidate, 30 steps, cached conditioning (round-1 headline config)"})
    _note("config 5b done")

    # batched streams (BASELINE config 5 "batched"): 4 texts, one voice, one
    # GPT batch + one diffusion/vocoder batch (api.tts_batch)
    texts = [text,
             "jin1 tian1 xing1 qi1 liu4 wo3 men5 qu4 gong1 yuan2 san4 bu4",
             "zhe4 ge4 wen4 ti2 hen3 you3 yi4 si1 rang4 wo3 xiang3 yi2 xia4",
             "huan1 ying2 da4 jia1 shou1 kan4 jin1 tian1 de5 jie2 mu4"]

    def batched(seed):
        return tts.tts_batch(texts, voice, 32000, preset="fast",
                             max_generate_length=256, seed=seed,
                             voice_cache_key="v")

    wavs = batched(0)
    audio7 = sum(len(w) for w in wavs) / 24000.0
    dt7 = _timeit(lambda: batched(0), iters=3)
    rows.append({"config": "5c_batched_streams", "streams": len(texts),
                 "rtf": round(dt7 / audio7, 5), "wall_s": round(dt7, 4),
                 "audio_s": round(audio7, 3),
                 "audio_sec_per_sec": round(audio7 / dt7, 1),
                 "note": "4 texts × 4 AR candidates in one GPT batch; one diffusion/vocoder batch; cached conditioning"})
    _write_detail(rows, n_params)
    _note("config 5c done")

    # 5d: the same 4 streams through the ultra_fast preset (1 AR candidate,
    # 30 diffusion steps — a real serving preset, api.py PRESETS): the
    # throughput-oriented batched number (VERDICT r2 next #5 target)
    def batched_tuned(seed):
        return tts.tts_batch(texts, voice, 32000, preset="ultra_fast",
                             max_generate_length=256, seed=seed,
                             voice_cache_key="v")

    wavs5d = batched_tuned(0)
    audio5d = sum(len(w) for w in wavs5d) / 24000.0
    dt5d = _timeit(lambda: batched_tuned(0), iters=3)
    rows.append({"config": "5d_batched_streams_tuned", "streams": len(texts),
                 "rtf": round(dt5d / audio5d, 5), "wall_s": round(dt5d, 4),
                 "audio_s": round(audio5d, 3),
                 "audio_sec_per_sec": round(audio5d / dt5d, 1),
                 "note": "4 texts, ultra_fast preset (1 AR candidate, 30 "
                         "diffusion steps); one GPT batch, one tail batch"})
    _note("config 5d done")

    # 5e: sustained pipelined serving — 3 batches of 4 streams through
    # tts_batch_many (batch i+1's GPT decode dispatched while batch i's tail
    # is in flight; audio fetches deferred). Measures steady-state
    # audio-s/s with the host/tunnel gaps hidden.
    def sustained():
        return tts.tts_batch_many([texts, texts, texts], voice, 32000,
                                  preset="fast", max_generate_length=256,
                                  seed=0, voice_cache_key="v")

    outs5e = sustained()
    audio5e = sum(len(w) for batch in outs5e for w in batch) / 24000.0
    dt5e = _timeit(sustained, iters=3)
    rows.append({"config": "5e_sustained_pipelined", "batches": 3,
                 "streams_per_batch": len(texts),
                 "audio_s": round(audio5e, 3), "wall_s": round(dt5e, 4),
                 "audio_sec_per_sec": round(audio5e / dt5e, 1),
                 "note": "tts_batch_many: software-pipelined request batches "
                         "at reference defaults (4 AR candidates, 50 steps)"})
    _write_detail(rows, n_params)
    _note("config 5e done")

    # stage breakdown of the batched path (host-synced, so times are per
    # stage but the total is slightly above the honest 5c row)
    tts.profile_stages = True
    batched(1)
    tts.profile_stages = False
    rows.append({"config": "5c_stage_breakdown",
                 "stage_wall_s": {k: round(v, 4)
                                  for k, v in tts.last_stage_times.items()},
                 "note": "host-synced per-stage times of one 5c call"})

    # ------------------------------------------------------------------
    # optional rows below: each is guarded by the soft budget so a cold-
    # cache run degrades to recorded skips instead of an rc=124 kill
    def over_budget(cfg_name, est_s=60.0):
        if _elapsed() + est_s > BUDGET_S:
            rows.append({"config": cfg_name, "skipped": True,
                         "note": f"soft budget BENCH_BUDGET_S={BUDGET_S:.0f}s "
                                 f"reached at +{_elapsed():.0f}s (cold-cache "
                                 "compile guard; re-run warm for this row)"})
            _write_detail(rows, n_params)
            return True
        return False

    # ---- config 1: codec mel+VQ encode/decode roundtrip (api path) --------
    hop = tts.cfg.audio.hop_length
    wav32 = jnp.asarray(voice[: (len(voice) // hop) * hop])[None]
    ids = np.asarray(tts.tok.encode("ni3 hao3 shi4 jie4"), np.int32)
    text_ids = jnp.asarray(ids)[None]

    from ttts_tpu.ops.mel import vits_spectrogram

    if not over_budget("1_codec_roundtrip"):
        _codec_decode = jax.jit(lambda p, c, t, s: tts.codec.apply(
            p, c, t, s, method=tts.codec.decode,
            rngs={"noise": jax.random.key(0)}))

        def roundtrip():
            codes = tts._extract_code_fn(tts.params["codec"], wav32)
            spec = vits_spectrogram(wav32, tts.cfg.audio.filter_length, hop,
                                    tts.cfg.audio.win_length).swapaxes(1, 2)
            wav = _codec_decode(tts.params["codec"],
                                jnp.transpose(codes, (1, 0, 2)),
                                text_ids, spec)
            return np.asarray(wav)

        secs1 = wav32.shape[1] / 32000.0
        dt1 = _timeit(roundtrip, iters=3)
        rows.append({"config": "1_codec_roundtrip",
                     "rtf": round(dt1 / secs1, 5),
                     "wall_s": round(dt1, 4), "audio_s": round(secs1, 3)})
        _note("config 1 done")

    # ---- config 2: batched VQ extraction -----------------------------------
    if not over_budget("2_batched_vq_extract"):
        b2, secs_each = 8, 8.0
        wavs2 = jnp.asarray(
            rng.standard_normal((b2, int(secs_each * 32000) // hop * hop))
            .astype(np.float32) * 0.1)

        dt2 = _timeit(lambda: np.asarray(
            tts._extract_code_fn(tts.params["codec"], wavs2)))
        xrt2 = (b2 * secs_each) / dt2
        rows.append({"config": "2_batched_vq_extract",
                     "audio_sec_per_sec": round(xrt2, 1),
                     "wall_s": round(dt2, 4), "batch": b2})
        _note("config 2 done")

    # ---- config 3: GPT AR decode -------------------------------------------
    b3, gen_len = 8, 200
    text3 = jnp.asarray(rng.integers(1, 255, size=(b3, 64)))
    prompt3 = jnp.asarray(rng.integers(0, 1024, size=(b3, 48)))

    if not over_budget("3_gpt_ar_decode", est_s=120.0):
        # serve params (bf16 matmul weights) — what api.py actually decodes
        # with; raw-f32 measurement under-reported serving throughput (~56%
        # of the model step is weight reads)
        gp3 = tts._serve_params("gpt")
        dt3 = _timeit(lambda: np.asarray(tts._gpt_sample_fn(
            gp3, text3[:1], prompt3[:1], jax.random.key(1), gen_len,
            b3, early_stop=False)))
        toks = b3 * gen_len / dt3
        gpt_mfu = 2 * n_params["gpt"] * toks / V5E_PEAK_FLOPS
        rows.append({"config": "3_gpt_ar_decode",
                     "tokens_per_sec": round(toks, 1),
                     "batch": b3, "gen_len": gen_len,
                     "mfu_est": round(gpt_mfu, 5)})

        # device cost per decode step: subtract a prefill-only call at the
        # SAME shapes — both calls carry the same tunnel round-trip (config 0)
        # and the same one-off prefill, so the difference is the pure
        # 200-step decode scan. (A 200-vs-400-gen slope would overstate: the
        # longer call also attends over a wider static KV cache every step.)
        text_b3 = jnp.tile(text3[:1], (b3, 1))
        prompt_b3 = jnp.tile(prompt3[:1], (b3, 1))
        max_len3 = text_b3.shape[1] + 2 + prompt_b3.shape[1] + 1 + gen_len
        prefill_fn = jax.jit(lambda p: tts.gpt.apply(
            p, text_b3, prompt_b3, max_len3, method=tts.gpt.prefill)[1])
        dt3p = _timeit(lambda: np.asarray(prefill_fn(tts._serve_params("gpt"))))
        if dt3 > dt3p:
            toks_dev = b3 * gen_len / (dt3 - dt3p)
            rows.append({
                "config": "3c_gpt_ar_decode_device",
                "tokens_per_sec_device": round(toks_dev, 1),
                "us_per_step_device": round(1e6 * (dt3 - dt3p) / gen_len, 1),
                "batch": b3,
                "mfu_est": round(2 * n_params["gpt"] * toks_dev / V5E_PEAK_FLOPS, 5),
                "note": "full decode call minus a prefill-only call at the "
                        "same shapes — pure decode-scan cost, net of tunnel "
                        "+ prefill"})

        # 3b: the serving default — lax.while_loop early exit once every
        # stream has emitted stop_mel_token (api.py always decodes this way);
        # tokens/s counts the tokens actually generated before each stop
        codes3b = np.asarray(tts._gpt_sample_fn(
            gp3, text3[:1], prompt3[:1], jax.random.key(1), gen_len,
            b3, early_stop=True))
        stop_tok = tts.cfg.gpt.stop_mel_token
        gen_counts = np.minimum((codes3b != stop_tok).sum(axis=-1) + 1, gen_len)
        dt3b = _timeit(lambda: np.asarray(tts._gpt_sample_fn(
            gp3, text3[:1], prompt3[:1], jax.random.key(1), gen_len,
            b3, early_stop=True)))
        rows.append({"config": "3b_gpt_ar_decode_early_exit",
                     "tokens_per_sec": round(float(gen_counts.sum()) / dt3b, 1),
                     "batch": b3, "max_gen_len": gen_len,
                     "gen_len_actual": [int(x) for x in gen_counts],
                     "wall_s": round(dt3b, 4),
                     "note": "serving-default while_loop early stop "
                             "(fixed-length row 3 is the honest throughput number)"})
        _write_detail(rows, n_params)
        _note("config 3/3b/3c done")

    # ---- config 4: diffusion(50) + vocos ------------------------------------
    bucket = 192                      # 8.192 s utterance
    out_len = bucket * 4
    latent = jnp.asarray(rng.standard_normal(
        (1, bucket, tts.cfg.diffusion_net.in_latent_channels)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal((1, 188, 100)).astype(np.float32))
    audio4 = out_len * tts.cfg.vocos.hop_length / 24000.0

    if not over_budget("4_diffusion50_vocos", est_s=120.0):
        def diff_vocos():
            mel = tts._diffusion_decode(latent, refer, jax.random.key(2), 50,
                                        out_len)
            return np.asarray(tts._vocode(mel))

        dt4 = _timeit(diff_vocos, iters=3)
        # 50 steps × 2B CFG forwards over out_len frames
        diff_flops = 2 * n_params["diffusion"] * out_len * 2 * 50
        rows.append({"config": "4_diffusion50_vocos",
                     "rtf": round(dt4 / audio4, 5),
                     "wall_s": round(dt4, 4), "audio_s": round(audio4, 3),
                     "mfu_est": round(diff_flops / dt4 / V5E_PEAK_FLOPS, 4)})
        _note("config 4 done")

    if not over_budget("4b_vocos_only"):
        mel4 = tts._diffusion_decode(latent, refer, jax.random.key(2), 50,
                                     out_len)
        dtv = _timeit(lambda: np.asarray(tts._vocode(mel4)))
        # single-call wall time here is ~all tunnel floor (config 0): Vocos
        # device time is ~1 ms/768 frames since the dense-OLA ISTFT. Report
        # the honest device cost as the slope of N sequential applies inside
        # ONE program. n=64 per CLAUDE.md lesson (l): at n=8 the slope sits
        # inside the ±ms tunnel jitter and once produced a 19 M-frames/s
        # "measurement" (mfu 2.7 — physically impossible).
        n_am = 64

        def vocos_scan(n):
            def run(params, mel):
                def step(acc, _):
                    out = tts.vocos.apply(params, mel + acc * 1e-9)
                    return jnp.float32(acc + out.sum()), ()
                return jax.lax.scan(step, jnp.float32(0), jnp.arange(n))[0]
            return jax.jit(run, static_argnums=())

        v1, vN = vocos_scan(1), vocos_scan(n_am)
        tv1 = _timeit(lambda: np.asarray(v1(tts.params["vocos"], mel4)))
        tvN = _timeit(lambda: np.asarray(vN(tts.params["vocos"], mel4)))
        dtv_am = (tvN - tv1) / (n_am - 1)
        row4b = {"config": "4b_vocos_only",
                 "mel_frames_per_sec": round(out_len / dtv, 1),
                 "audio_sec_per_sec": round(audio4 / dtv, 1),
                 "mfu_est": round(2 * n_params["vocos"] * out_len / dtv
                                  / V5E_PEAK_FLOPS, 4),
                 "note": "single-call rate is tunnel-floor-bound "
                         "(config 0); _device rows are the amortized "
                         "slope of 64 applies in one program"}
        if dtv_am > 5e-5:  # below ~50 µs/apply the slope is tunnel jitter
            row4b.update(
                mel_frames_per_sec_device=round(out_len / dtv_am, 1),
                audio_sec_per_sec_device=round(audio4 / dtv_am, 1),
                mfu_est_device=round(2 * n_params["vocos"] * out_len
                                     / dtv_am / V5E_PEAK_FLOPS, 4))
        else:
            row4b["note"] += "; slope below measurement resolution this run"
        rows.append(row4b)
        _note("config 4b done")

    # ---- config 4c: BATCHED diffusion(50) + vocos at FIXED shapes ----------
    # the deterministic-shape version of config 5c's tail: generated lengths
    # in the 5x rows are a sampling lottery under random weights (a ±1-bf16-
    # ulp numeric change upstream flips sampled tokens and so audio_s), so
    # this row is the round-over-round comparator for tail/trunk perf.
    # 4 streams × CFG 2B → trunk batch 8 at T=896 — the Pallas flash-trunk
    # path (diffusion_net._use_flash: b·t ≥ 4096).
    if not over_budget("4c_batched_tail_fixed", est_s=120.0):
        bucket4c = 224
        out4c = bucket4c * 4              # 896 frames = 9.557 s per stream
        lat4c = jnp.asarray(rng.standard_normal(
            (4, bucket4c, tts.cfg.diffusion_net.in_latent_channels))
            .astype(np.float32))
        refer4c = jnp.asarray(
            rng.standard_normal((4, 188, 100)).astype(np.float32))
        audio4c = out4c * tts.cfg.vocos.hop_length / 24000.0 * 4

        def diff_vocos4c():
            mel = tts._diffusion_decode(lat4c, refer4c, jax.random.key(2), 50,
                                        out4c)
            return np.asarray(tts._vocode(mel))

        dt4c = _timeit(diff_vocos4c, iters=3)
        rows.append({"config": "4c_batched_tail_fixed", "streams": 4,
                     "wall_s": round(dt4c, 4), "audio_s": round(audio4c, 3),
                     "audio_sec_per_sec": round(audio4c / dt4c, 1),
                     "mfu_est": round(2 * n_params["diffusion"] * out4c * 4 * 2
                                      * 50 / dt4c / V5E_PEAK_FLOPS, 4),
                     "note": "4-stream diffusion(50)+Vocos at fixed T=896 — "
                             "deterministic-shape tail of 5c (flash trunk path)"})
        _note("config 4c done")

    # ---- config 6: host loader throughput (no chip; VERDICT r2 #7) ---------
    import subprocess
    if not over_budget("6_host_loader", est_s=90.0):
        try:
            out = subprocess.run(
                [sys.executable, str(pathlib.Path(__file__).parent / "scripts" /
                                     "bench_loader.py"), "--clips", "48",
                 "--batches", "8", "--no-warp", "--step-ms", "576"],
                # --no-warp: the default GAN path warps on DEVICE inside the
                # train step (mains.py device_warp=True), so the host loader
                # only decodes/resamples/buckets; --step-ms 576 is the
                # measured on-chip GAN step incl. the device warp
                # (bench_gan_dsp).
                capture_output=True, text=True, timeout=420)
            lrow = json.loads(out.stdout.strip().splitlines()[-1])
            rows.append({"config": "6_host_loader",
                         "audio_sec_per_sec": lrow["value"],
                         "unit": lrow["unit"],
                         "step_consumption_audio_sec_per_sec":
                             lrow["step_consumption_audio_sec_per_sec"],
                         "headroom_x": lrow["headroom_x"]})
        except Exception as e:  # host-loader row is informative, never fatal
            rows.append({"config": "6_host_loader", "error": str(e)[:200]})

    detail = _write_detail(rows, n_params)
    print(json.dumps(detail, indent=1), file=sys.stderr)
    return None  # headline already printed (exactly one stdout JSON line)


def _write_detail(rows, n_params):
    detail = {"rows": rows, "params_M": {k: round(v / 1e6, 2) for k, v in n_params.items()},
              "peak_flops_assumed": V5E_PEAK_FLOPS,
              "total_bench_wall_s": round(_elapsed(), 1)}
    try:
        pathlib.Path("BENCH_DETAIL.json").write_text(json.dumps(detail, indent=1))
    except OSError:
        pass
    return detail


def bench_gpt_decode():
    import jax
    import jax.numpy as jnp

    from ttts_tpu.config import GPTConfig
    from ttts_tpu.models.gpt import (
        UnifiedVoice,
        cast_params_for_inference,
        inference_speech,
    )
    from ttts_tpu.models.sampling import SamplingParams

    cfg = GPTConfig()
    model = UnifiedVoice(cfg, dtype=jnp.bfloat16)

    b, lt, lp, gen_len = 8, 64, 50, 200
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 255, size=(b, lt)))
    prompt = jnp.asarray(rng.integers(0, 1024, size=(b, lp)))
    dummy_codes = jnp.asarray(rng.integers(0, 1024, size=(b, 16)))
    params = model.init(
        jax.random.key(0), text, jnp.full((b,), lt), dummy_codes,
        jnp.full((b,), 16 * 1024),
    )
    params = cast_params_for_inference(params)

    run = jax.jit(
        lambda p, t, c, k: inference_speech(
            model, p, t, c, k, max_generate_length=gen_len,
            sampling=SamplingParams(top_p=0.8, temperature=0.8, repetition_penalty=2.0),
            early_stop=False,  # honest fixed-length measurement
        )
    )
    np.asarray(run(params, text, prompt, jax.random.key(1)))
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(run(params, text, prompt, jax.random.key(2 + i)))
    dt = (time.perf_counter() - t0) / iters
    tokens_per_sec = b * gen_len / dt
    return {
        "metric": "gpt_ar_decode_tokens_per_sec",
        "value": round(tokens_per_sec, 2),
        "unit": "mel-codes/s (batch 8, 6L×512d KV-cache decode)",
        "vs_baseline": round(tokens_per_sec / 25.0 * 0.05, 3),
    }


_HEADLINE_PRINTED = False


def main():
    try:
        bench_all()  # prints the headline line itself (exactly one)
    except Exception as e:  # graceful degradation — headline must still print
        print(f"[bench] suite failed ({type(e).__name__}: {e})", file=sys.stderr)
        if not _HEADLINE_PRINTED:
            print("[bench] falling back to GPT decode", file=sys.stderr)
            print(json.dumps(bench_gpt_decode()))


if __name__ == "__main__":
    main()
