"""End-to-end zero-shot TTS serving pipeline.

The v2 inference product (demo.ipynb cells 6-12 / ttts/api_zh.py call stack,
SURVEY §3.1), plus the v1-style `TextToSpeech` class surface (ttts/api.py:154)
where meaningful (presets, conditioning caching, candidate reranking):

  text → pinyin → BPE → [prompt wav → codec extract_code → prompt VQ codes]
       → GPT AR decode (k candidates, jitted scan with static KV cache)
       → CLVP rerank → GPT return_latent for the winner
       → SpacedDiffusion DPM++(2M) 50 steps, cond-free k=2, batched CFG
       → denormalize mel → Vocos → 24 kHz wav.

Every stage is its own jit program with shape bucketing (text/prompt lengths
round up to 16) so recompilation is bounded; models stay resident on device
(the v2 scripts' behavior — no per-stage CPU↔device shuffling like
api.py temporary_cuda:219).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import TTTSConfig, default_config
from ttts_tpu.diffusion import get_ode_sampler
from ttts_tpu.diffusion.dpm import cfg_eps_fn
from ttts_tpu.models.clvp import CLVP
from ttts_tpu.models.diffusion_net import (
    AA_diffusion,
    denormalize_tacotron_mel,
    normalize_tacotron_mel,
)
from ttts_tpu.models.gpt import UnifiedVoice, inference_speech
from ttts_tpu.models.sampling import SamplingParams
from ttts_tpu.models.vocos import Vocos
from ttts_tpu.models.vqvae import SynthesizerTrn
from ttts_tpu.ops.mel import acoustic_mel_spectrogram, vits_spectrogram
from ttts_tpu.ops.resample import resample
from ttts_tpu.text import default_tokenizer, text_to_pinyin

# Tortoise-style presets (ttts/api.py:276-281), adapted to the v2 stages.
PRESETS = {
    "ultra_fast": {"num_autoregressive_samples": 1, "diffusion_iterations": 30},
    "fast": {"num_autoregressive_samples": 4, "diffusion_iterations": 50},
    "standard": {"num_autoregressive_samples": 8, "diffusion_iterations": 50},
    "high_quality": {"num_autoregressive_samples": 16, "diffusion_iterations": 100},
}


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _code_bucket(code_len: int, cap: int, trunk_batch: int = 1) -> int:
    """Mel-code bucket for the diffusion/vocoder tail: round up to 32 (bounds
    jit recompiles and keeps padded-latent pollution ≤ one bucket), then — on
    accelerators, WHEN the trunk will actually take the Pallas flash path at
    (trunk_batch, 4×bucket) — nudge up to the next bucket whose trunk length
    lets the kernel pick a ≥256-row query block (ops/pallas/attention.py blk
    policy). Measured on v5e at B=8: T=896 is stuck at blk=128 (0.71 ms/attn)
    while T=1024 runs blk=512 (0.52 ms) — +14% frames, −27% attention; the
    extra padded frames are the same pollution mechanism the 32-bucket
    already has (trunk attention is unmasked, reference parity) and the
    output is trimmed to the exact code length regardless. Single-stream
    tails (B·T < the flash gate) stay on XLA einsum, where longer T only
    costs — no nudge. CPU keeps the plain 32-bucket so the golden e2e
    snapshot stays pinned. trunk_batch = streams × 2 (batched CFG)."""
    import jax

    bucket = min(_round_up(code_len, 32), cap)
    if jax.default_backend() in ("cpu",):
        return bucket
    best_blk = lambda t: next(
        (c for c in (512, 384, 256, 128) if t % c == 0 and c * t <= 1 << 20),
        128)
    flash_engages = lambda t: (t % 128 == 0 and t <= 6144
                               and (t >= 1536 or trunk_batch * t >= 4096))
    for b in range(bucket, min(bucket + 97, cap + 1), 32):
        if flash_engages(4 * b) and best_blk(4 * b) >= 256:
            return b
    return bucket  # einsum-path shapes / very long T: don't pad


class TextToSpeech:
    """Resident-model serving orchestrator."""

    ALL_STAGES = ("codec", "gpt", "diffusion", "vocos", "clvp")

    def __init__(self, cfg: Optional[TTTSConfig] = None, params: Optional[Dict] = None,
                 seed: int = 0, use_bf16: Optional[bool] = None,
                 init_stages: Optional[tuple] = None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis for
        data-parallel batched serving — params replicate across the mesh and
        `tts_batch` shards its stream batch over 'data' (GSPMD inserts no
        collectives on this path: every stream is independent, so scaling is
        embarrassingly parallel across chips). Single-utterance `tts` runs
        replicated."""
        self.cfg = cfg or default_config()
        self.tok = default_tokenizer()
        c = self.cfg
        if use_bf16 is None:
            use_bf16 = jax.default_backend() not in ("cpu",)
        act_dtype = jnp.bfloat16 if use_bf16 else jnp.float32

        # under a GSPMD mesh, route decode through decode_attention_spmd —
        # a custom_partitioning rule shards the packed head-major cache dim,
        # so the fused kernel stays engaged per-shard (TP head chunks are
        # contiguous in the cache's minor dim by construction, models/gpt.py
        # KVCache)
        gpt_cfg = c.gpt if mesh is None else dataclasses.replace(
            c.gpt, decode_spmd=True)
        self.gpt = UnifiedVoice(gpt_cfg, dtype=act_dtype)
        self.codec = SynthesizerTrn(
            c.vqvae, spec_channels=c.audio.filter_length // 2 + 1,
            segment_frames=c.train.segment_size // c.audio.hop_length,
        )
        # Pallas fused attention on the per-step trunk path when a real
        # accelerator backs the session (CPU keeps the XLA path). If the
        # mesh carries an 'sp' axis, the trunk's attention runs sequence-
        # parallel ring attention over it (SURVEY §5.7 — long-utterance
        # synthesis past the single-chip score/VMEM bound; the reference
        # caps lengths instead, ttts/gpt/config.json 1600+800).
        sp_mesh = (mesh if mesh is not None
                   and mesh.shape.get("sp", 1) > 1 else None)
        on_accel = jax.default_backend() not in ("cpu",)
        self.diffusion_net = AA_diffusion(
            c.diffusion_net, dtype=act_dtype,
            flash=on_accel and sp_mesh is None,
            # Pallas whole-block resblock kernel on the same per-step path
            # (ops/pallas/resblock.py) — the GN/FiLM/elementwise chain is
            # the bandwidth bottleneck once attention is fused
            fused_res=on_accel and sp_mesh is None,
            sp_mesh=sp_mesh,
        )
        self.vocos = Vocos(c.vocos)
        self.clvp = CLVP(c.clvp, dtype=act_dtype)
        self.params = params if params is not None else self._random_init(
            seed, self.ALL_STAGES if init_stages is None else init_stages
        )
        self.mesh = mesh
        if mesh is not None:
            from ttts_tpu.parallel import replicate, with_sharding

            self.params = with_sharding(self.params, replicate(mesh))
        # conditioning cache: voice id → (prompt_codes, refer_mel)
        self._cond_cache: Dict[str, tuple] = {}
        # when True, tts/tts_batch force a host sync after each stage and
        # record wall times into last_stage_times (perf analysis only — the
        # syncs serialize stages, so never enable on the serving path)
        self.profile_stages = False
        self.last_stage_times: Dict[str, float] = {}
        # serving weight cache: stage → (source_tree, bf16-cast tree)
        self._use_bf16 = use_bf16
        self._cast_cache: Dict[str, tuple] = {}

    def _shard_stream_batch(self, x: jax.Array) -> jax.Array:
        """Place a (B, ...) serving batch on the mesh 'data' axis when B
        divides evenly; otherwise leave it replicated (still correct — GSPMD
        just runs the program unsharded)."""
        if self.mesh is None:
            return x
        from ttts_tpu.parallel import data_axis_size, shard_batch

        n_data = data_axis_size(self.mesh)
        if x.shape[0] % n_data != 0:
            return x
        return jax.device_put(x, shard_batch(self.mesh, x.ndim))

    def _serve_params(self, stage: str):
        """Matmul weights in bf16 for the bandwidth-bound serving programs
        (gpt decode / diffusion scan); norms and heads stay f32 (gpt.py
        cast_params_for_inference). Identity-keyed so external weight updates
        (checkpoint restores) invalidate the cast copy. Measured: 50-step
        tail 196 → 182 ms. No-op off-TPU to keep CPU parity tests exact."""
        if not self._use_bf16:
            return self.params[stage]
        src = self.params[stage]
        hit = self._cast_cache.get(stage)
        if hit is None or hit[0] is not src:
            from ttts_tpu.models.gpt import cast_params_for_inference

            self._cast_cache[stage] = (src, cast_params_for_inference(src))
        return self._cast_cache[stage][1]

    @classmethod
    def from_checkpoints(cls, cfg: Optional[TTTSConfig] = None, *,
                         codec=None, gpt=None, diffusion=None, vocos=None,
                         clvp=None, seed: int = 0, **kw) -> "TextToSpeech":
        """Serving pipeline from trained checkpoints — the reference's
        infer_utils.load_model registry + api_zh.py:8-14 loading flow, minus
        its hardcoded home-dir paths (and with load_model('vqvae') actually
        working — the reference's is bit-rotted, infer_utils.py:18-22).

        Each stage arg is a Trainer checkpoint dir (Orbax; paired GAN trees
        resolve to the generator side) or a release .npz from
        export_release. Stages left None stay random-init (smoke tests)."""
        from ttts_tpu.infer_utils import load_model

        cfg = cfg or default_config()
        registry = {"codec": ("vqvae", codec), "gpt": ("gpt", gpt),
                    "diffusion": ("diffusion", diffusion),
                    "vocos": ("vocos", vocos), "clvp": ("clvp", clvp)}
        missing = tuple(s for s, (_, p) in registry.items() if p is None)
        tts = cls(cfg, seed=seed, init_stages=missing, **kw)
        for stage, (name, path) in registry.items():
            if path is None:
                continue
            _, variables = load_model(name, str(path), cfg)
            tts.set_params(stage, variables)
        return tts

    def set_params(self, stage: str, tree) -> None:
        """Replace a stage's weights for serving. Subtrees must be replaced
        WHOLESALE — the bf16 cast cache above is keyed by object identity, so
        mutating leaves inside ``self.params[stage]`` in place would leave
        serving on a stale cast copy. This setter installs the new tree and
        drops the cast cache (plus cached conditioning, which embeds codec
        outputs, when codec weights change)."""
        self.params[stage] = tree
        self._cast_cache.pop(stage, None)
        if stage == "codec":
            self._cond_cache.clear()

    # ------------------------------------------------------------------ init

    def _random_init(self, seed: int, stages=ALL_STAGES) -> Dict:
        """Random-init parameters (used for pipeline testing and
        benchmarking; real deployments restore from checkpoints). `stages`
        limits which models get initialized — each init is a compile.

        The five init compiles are dispatched from a thread pool: each one is
        an independent XLA compile that blocks on the backend (through the
        remote-chip tunnel each costs tens of seconds), so overlapping them
        cuts cold-start wall to ~max instead of ~sum (measured 246 → 114 s
        on the tunnel; no-op for warm persistent-cache runs)."""
        c = self.cfg
        key = jax.random.key(seed)
        hop = c.audio.hop_length
        frames = 8
        wav32 = jnp.zeros((1, frames * hop, 1))
        spec = jnp.zeros((1, frames, c.audio.filter_length // 2 + 1))
        sl = jnp.asarray([frames])
        text = jnp.zeros((1, 8), jnp.int32)
        tl = jnp.asarray([8])
        codes = jnp.zeros((1, 16), jnp.int32)
        wl = jnp.asarray([16 * 1024])
        rngs = {"params": key, "noise": key, "slice": key, "vq": key}
        mel = jnp.zeros((1, 32, c.diffusion_net.in_channels))
        latent = jnp.zeros((1, 16, c.diffusion_net.in_latent_channels))
        # jit the inits: eager init dispatches the whole graph op-by-op
        thunks = {
            "codec": lambda: jax.jit(
                functools.partial(self.codec.init, train=False)
            )(rngs, wav32, wav32, spec, spec, sl, text, tl),
            "gpt": lambda: jax.jit(self.gpt.init)(key, text, tl, codes, wl),
            "diffusion": lambda: jax.jit(self.diffusion_net.init)(
                key, mel, jnp.asarray([1.0]), latent, mel
            ),
            "vocos": lambda: jax.jit(self.vocos.init)(key, mel),
            "clvp": lambda: jax.jit(self.clvp.init)(key, text, codes),
        }
        todo = [s for s in self.ALL_STAGES if s in stages]
        if len(todo) <= 1:
            return {s: thunks[s]() for s in todo}
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(todo)) as pool:
            futs = {s: pool.submit(thunks[s]) for s in todo}
        return {s: futs[s].result() for s in todo}

    # ------------------------------------------------- conditioning (prompt)

    @functools.cached_property
    def _conditioning_fn(self):
        """One fused jit program for the whole conditioning stage. Eager
        execution dispatches each resample/STFT/matmul op separately over the
        chip tunnel (~60-90 ms a round trip — CLAUDE.md); fusing the two
        resamples, the codec extract_code and the acoustic mel into one
        program makes conditioning a single dispatch (measured 94 → ~35 ms
        on a 4 s prompt). Compiles once per (prompt_length, sample_rate)."""
        c = self.cfg

        def fn(params, wav, in_sr: int):
            wav32 = resample(wav, in_sr, c.audio.sampling_rate)
            hop = c.audio.hop_length
            t = (wav32.shape[1] // hop) * hop
            wav32 = wav32[:, :t]
            spec = vits_spectrogram(
                wav32, c.audio.filter_length, hop, c.audio.win_length
            ).swapaxes(1, 2)
            codes = self.codec.apply(
                params, wav32[..., None], spec, jnp.asarray([spec.shape[1]]),
                method=self.codec.extract_code,
            )
            wav24 = resample(wav, in_sr, c.acoustic_mel.sample_rate)
            refer_mel = acoustic_mel_spectrogram(
                wav24, c.acoustic_mel.sample_rate, c.acoustic_mel.n_fft,
                c.acoustic_mel.hop_length, c.acoustic_mel.n_mels,
            ).swapaxes(1, 2)  # (1, T, 100)
            return codes[:, 0, :], refer_mel

        return jax.jit(fn, static_argnames=("in_sr",))

    def get_conditioning(self, voice_wav: np.ndarray, sample_rate: int,
                         cache_key: Optional[str] = None):
        """prompt wav → (prompt VQ codes (1, Lp), reference mel (1, Tr, 100)).
        Analogue of api.py get_conditioning_latents:225 over prompt codes."""
        if cache_key and cache_key in self._cond_cache:
            return self._cond_cache[cache_key]
        wav = jnp.asarray(voice_wav, jnp.float32).reshape(1, -1)
        out = self._conditioning_fn(self.params["codec"], wav, sample_rate)
        if cache_key:
            self._cond_cache[cache_key] = out
        return out

    # ---------------------------------------------------------------- stages
    # jitted closures take params explicitly so weight updates don't bake into
    # the compiled programs; shape buckets bound recompilation.

    @functools.cached_property
    def _extract_code_fn(self):
        c = self.cfg

        def fn(params, wav32):
            spec = vits_spectrogram(
                wav32, c.audio.filter_length, c.audio.hop_length, c.audio.win_length
            ).swapaxes(1, 2)
            return self.codec.apply(
                params, wav32[..., None], spec, jnp.asarray([spec.shape[1]]),
                method=self.codec.extract_code,
            )

        return jax.jit(fn)

    @functools.cached_property
    def _gpt_sample_fn(self):
        def fn(params, text_ids, prompt_codes, key, max_gen, num_samples,
               early_stop=True):
            text_b = jnp.tile(text_ids, (num_samples, 1))
            prompt_b = jnp.tile(prompt_codes, (num_samples, 1))
            tp = 1 if self.mesh is None else self.mesh.shape.get("model", 1)
            return inference_speech(
                self.gpt, params, text_b, prompt_b, key, max_gen,
                SamplingParams(top_p=0.8, temperature=0.8, repetition_penalty=2.0),
                early_stop=early_stop, tp_shards=tp,
            )

        return jax.jit(fn, static_argnames=("max_gen", "num_samples", "early_stop"))

    def _gpt_sample(self, text_ids, prompt_codes, key, max_gen, num_samples):
        return self._gpt_sample_fn(
            self._serve_params("gpt"), text_ids, prompt_codes, key, max_gen,
            num_samples,
        )

    @functools.cached_property
    def _clvp_rank_fn(self):
        def fn(params, text_ids, codes):
            if text_ids.shape[0] != codes.shape[0]:
                text_ids = jnp.tile(text_ids, (codes.shape[0], 1))
            return self.clvp.apply(params, text_ids, codes)

        return jax.jit(fn)

    def _clvp_rank(self, text_ids, codes):
        return self._clvp_rank_fn(self.params["clvp"], text_ids, codes)

    @functools.cached_property
    def _gpt_latent_fn(self):
        def fn(params, text_ids, codes, code_len):
            return self.gpt.apply(
                params, text_ids, jnp.asarray([text_ids.shape[1]]),
                codes, code_len * 1024, return_latent=True,
            )

        return jax.jit(fn)

    def _gpt_latent(self, text_ids, codes, code_len):
        return self._gpt_latent_fn(self.params["gpt"], text_ids, codes, code_len)

    @functools.cached_property
    def _diffusion_decode_fn(self):
        def fn(params, latent, refer_mel, key, steps, out_len, guidance_scale):
            refer = normalize_tacotron_mel(refer_mel)
            cond = self.diffusion_net.apply(
                params, latent, refer, out_len,
                method=self.diffusion_net.timestep_independent,
            )
            uncond_emb = params["params"]["unconditioned_embedding"]
            uncond = jnp.tile(uncond_emb, (latent.shape[0], out_len, 1))

            biases = self.diffusion_net.apply(
                params, out_len, 2 * latent.shape[0],
                method=self.diffusion_net.rel_biases
            )

            def trunk(x2, t2, emb2):
                return self.diffusion_net.apply(
                    params, x2, t2, emb2, rel_biases=biases,
                    method=self.diffusion_net.trunk,
                )

            eps_fn = cfg_eps_fn(trunk, cond, uncond, guidance_scale)
            noise = jax.random.normal(
                key, (latent.shape[0], out_len, self.cfg.diffusion_net.in_channels)
            )
            sample = get_ode_sampler(self.cfg.diffusion.sampler)
            mel_norm = sample(eps_fn, noise, steps=steps)
            return denormalize_tacotron_mel(mel_norm)

        return jax.jit(fn, static_argnames=("steps", "out_len"))

    def _diffusion_decode(self, latent, refer_mel, key, steps, out_len,
                          guidance_scale: float = 2.0):
        return self._diffusion_decode_fn(
            self._serve_params("diffusion"), latent, refer_mel, key, steps,
            out_len, guidance_scale,
        )

    @functools.cached_property
    def _vocode_fn(self):
        def fn(params, mel):
            return self.vocos.apply(params, mel)

        return jax.jit(fn)

    def _vocode(self, mel):
        return self._vocode_fn(self.params["vocos"], mel)

    @functools.cached_property
    def _tail_fn(self):
        """latent → diffusion → vocoder in ONE jit program (a remote dispatch
        costs ~60-90 ms through the chip tunnel; fusing the tail removes two
        round-trips per utterance)."""

        def fn(gpt_params, diff_params, vocos_params, text_ids, codes, code_len,
               refer_mel, key, steps, out_len, guidance_scale):
            b = text_ids.shape[0]
            latent = self.gpt.apply(
                gpt_params, text_ids, jnp.full((b,), text_ids.shape[1]),
                codes, code_len * 1024, return_latent=True,
            )
            refer = normalize_tacotron_mel(refer_mel)
            cond = self.diffusion_net.apply(
                diff_params, latent, refer, out_len,
                method=self.diffusion_net.timestep_independent,
            )
            uncond_emb = diff_params["params"]["unconditioned_embedding"]
            uncond = jnp.tile(uncond_emb, (latent.shape[0], out_len, 1))

            # rel-pos biases hoisted out of the sampling scan (≈10× step cost
            # if recomputed per step)
            biases = self.diffusion_net.apply(
                diff_params, out_len, 2 * latent.shape[0],
                method=self.diffusion_net.rel_biases
            )

            def trunk(x2, t2, emb2):
                return self.diffusion_net.apply(
                    diff_params, x2, t2, emb2, rel_biases=biases,
                    method=self.diffusion_net.trunk,
                )

            eps_fn = cfg_eps_fn(trunk, cond, uncond, guidance_scale)
            noise = jax.random.normal(
                key, (latent.shape[0], out_len, self.cfg.diffusion_net.in_channels)
            )
            sample = get_ode_sampler(self.cfg.diffusion.sampler)
            mel = denormalize_tacotron_mel(sample(eps_fn, noise, steps=steps))
            return self.vocos.apply(vocos_params, mel)

        return jax.jit(fn, static_argnames=("steps", "out_len"))

    # ------------------------------------------------------------------- tts

    def tts(self, text: str, voice_wav: np.ndarray, voice_sample_rate: int,
            preset: str = "fast", max_generate_length: int = 400,
            seed: int = 0, voice_cache_key: Optional[str] = None) -> np.ndarray:
        """Full zero-shot synthesis. Returns a 24 kHz float waveform."""
        opts = PRESETS[preset]
        k = opts["num_autoregressive_samples"]
        key = jax.random.key(seed)

        ids = np.asarray(self.tok.encode(text_to_pinyin(text)), np.int32)
        lt = _round_up(len(ids), 16)
        text_ids = jnp.asarray(np.pad(ids, (0, lt - len(ids))))[None]

        prompt_codes, refer_mel = self.get_conditioning(
            voice_wav, voice_sample_rate, voice_cache_key
        )
        lp = _round_up(prompt_codes.shape[1], 16)
        prompt_codes = jnp.pad(prompt_codes, ((0, 0), (0, lp - prompt_codes.shape[1])))

        k1, k2 = jax.random.split(key)
        codes = self._gpt_sample(text_ids, prompt_codes, k1, max_generate_length, k)

        if k > 1:
            sims = self._clvp_rank(text_ids, codes)
            best = int(jnp.argmax(sims))
        else:
            best = 0
        best_codes = codes[best:best + 1]
        stop = self.cfg.gpt.stop_mel_token
        arr = np.asarray(best_codes[0])
        stops = np.where(arr == stop)[0]
        code_len = int(stops[0]) if len(stops) else arr.shape[0]
        code_len = max(code_len, 1)
        # bucket the code length — see _code_bucket (32-bucket + flash-blk
        # friendly trunk lengths on accelerators)
        bucket = _code_bucket(code_len, arr.shape[0], trunk_batch=2)
        clean = np.where(np.arange(arr.shape[0]) < code_len, arr, 0)[:bucket]
        best_codes = jnp.asarray(clean)[None]

        out_len = bucket * 4
        wav = self._tail_fn(
            self._serve_params("gpt"), self._serve_params("diffusion"),
            self.params["vocos"],
            text_ids, best_codes, jnp.asarray([code_len]), refer_mel, k2,
            opts["diffusion_iterations"], int(out_len),
            self.cfg.diffusion.cond_free_k,
        )
        # trim padding: exact audio = code_len × 4 mel frames × hop samples
        exact = code_len * 4 * self.cfg.vocos.hop_length
        return np.asarray(wav[0])[:exact]

    # ---- batched-stream stage helpers (shared by tts_batch and the
    # pipelined tts_batch_many; split so the sustained path can dispatch the
    # next batch's GPT decode while this batch's tail is still in flight) ----

    def _batch_front(self, texts, prompt_codes, key, k, max_generate_length):
        """Tokenize + dispatch the GPT decode for one batch of texts.

        Returns (text_ids (N, lt) device, codes (N*k, T) device, text_b).
        Does NOT host-sync: `codes` is an in-flight device array."""
        n = len(texts)
        all_ids = [np.asarray(self.tok.encode(text_to_pinyin(t)), np.int32)
                   for t in texts]
        lt = _round_up(max(len(i) for i in all_ids), 16)
        text_ids = jnp.asarray(
            np.stack([np.pad(i, (0, lt - len(i))) for i in all_ids])
        )  # (N, lt)
        lp = _round_up(prompt_codes.shape[1], 16)
        prompt_b = jnp.tile(
            jnp.pad(prompt_codes, ((0, 0), (0, lp - prompt_codes.shape[1]))),
            (n * k, 1),
        )
        text_b = jnp.repeat(text_ids, k, axis=0)  # (N*k, lt)
        codes = self._gpt_sample_fn(
            self._serve_params("gpt"),
            self._shard_stream_batch(text_b), self._shard_stream_batch(prompt_b),
            key, max_generate_length, 1
        )  # (N*k, T) — batch already expanded
        return text_ids, codes, text_b

    def _batch_tail(self, text_ids, codes, text_b, refer_mel, key, opts, k,
                    prof=None):
        """CLVP rerank + bucket + dispatch the diffusion/vocoder tail.

        Host-syncs on `codes` (needed for stop-token lengths), then returns
        (wav device array, code_lens) WITHOUT fetching the audio."""
        import time as _time

        n = text_ids.shape[0]
        t0 = _time.perf_counter()
        if k > 1:
            sims = np.asarray(
                self._clvp_rank_fn(self.params["clvp"], text_b, codes)
            )
            best = [int(np.argmax(sims[i * k:(i + 1) * k])) + i * k
                    for i in range(n)]
        else:
            best = list(range(n))
        if prof is not None:
            prof["clvp_rerank"] = _time.perf_counter() - t0

        stop = self.cfg.gpt.stop_mel_token
        arr = np.asarray(codes)[best]  # (N, T)
        code_lens = []
        for row in arr:
            stops = np.where(row == stop)[0]
            code_lens.append(max(int(stops[0]) if len(stops) else row.shape[0], 1))
        bucket = _code_bucket(max(code_lens), arr.shape[1],
                              trunk_batch=2 * len(code_lens))
        clean = np.stack([
            np.where(np.arange(arr.shape[1]) < cl, row, 0)[:bucket]
            for row, cl in zip(arr, code_lens)
        ])
        refer_b = jnp.tile(refer_mel, (n, 1, 1))
        wav = self._tail_fn(
            self._serve_params("gpt"), self._serve_params("diffusion"),
            self.params["vocos"],
            self._shard_stream_batch(text_ids),
            self._shard_stream_batch(jnp.asarray(clean)),
            self._shard_stream_batch(jnp.asarray(code_lens)),
            self._shard_stream_batch(refer_b), key,
            opts["diffusion_iterations"], int(bucket * 4),
            self.cfg.diffusion.cond_free_k,
        )
        return wav, code_lens

    def tts_batch(self, texts, voice_wav: np.ndarray, voice_sample_rate: int,
                  preset: str = "fast", max_generate_length: int = 400,
                  seed: int = 0, voice_cache_key: Optional[str] = None):
        """Batched streams: synthesize several texts against one voice in one
        GPT batch and one diffusion/vocoder batch (BASELINE config 5,
        'batched streams'). Returns a list of 24 kHz waveforms."""
        import time as _time

        opts = PRESETS[preset]
        k = opts["num_autoregressive_samples"]
        n = len(texts)
        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)
        prof = {} if self.profile_stages else None
        t0 = _time.perf_counter()

        prompt_codes, refer_mel = self.get_conditioning(
            voice_wav, voice_sample_rate, voice_cache_key
        )
        if prof is not None:
            np.asarray(prompt_codes)
            prof["conditioning"] = _time.perf_counter() - t0
            t0 = _time.perf_counter()
        text_ids, codes, text_b = self._batch_front(
            texts, prompt_codes, k1, k, max_generate_length
        )
        if prof is not None:
            np.asarray(codes)
            prof["gpt_decode"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        wav, code_lens = self._batch_tail(
            text_ids, codes, text_b, refer_mel, k2, opts, k, prof=prof
        )
        wav = np.asarray(wav)
        if prof is not None:
            prof["latent_diffusion_vocos"] = (
                _time.perf_counter() - t0 - prof.get("clvp_rerank", 0.0))
            self.last_stage_times = prof
        hop = self.cfg.vocos.hop_length
        return [wav[i, : code_lens[i] * 4 * hop] for i in range(n)]

    def tts_batch_many(self, batches, voice_wav: np.ndarray,
                       voice_sample_rate: int, preset: str = "fast",
                       max_generate_length: int = 400, seed: int = 0,
                       voice_cache_key: Optional[str] = None):
        """Sustained pipelined serving over a stream of request batches.

        A serial loop of `tts_batch` calls leaves the device idle during
        every host sync (stop-token scan, CLVP argmax, bucket build) and
        every tunnel round-trip — ~0.1-0.2 s per batch through the remote
        chip. This driver software-pipelines the two device stages: batch
        i+1's GPT decode is dispatched BEFORE batch i's codes are fetched,
        so the device queue never drains; audio fetches are deferred to the
        end. Device-order per batch: front_i, front_{i+1}, clvp_i, tail_i.
        Results are identical to per-batch `tts_batch` calls with the same
        per-batch seeds (same programs, same keys — only dispatch order
        changes). Returns a list of per-batch waveform lists."""
        opts = PRESETS[preset]
        k = opts["num_autoregressive_samples"]
        prompt_codes, refer_mel = self.get_conditioning(
            voice_wav, voice_sample_rate, voice_cache_key
        )
        keys = [jax.random.split(jax.random.key(seed + i))
                for i in range(len(batches))]

        fronts = []  # in-flight (text_ids, codes, text_b)
        tails = []   # in-flight (wav, code_lens)
        fronts.append(self._batch_front(
            batches[0], prompt_codes, keys[0][0], k, max_generate_length))
        for i, texts in enumerate(batches):
            if i + 1 < len(batches):
                fronts.append(self._batch_front(
                    batches[i + 1], prompt_codes, keys[i + 1][0], k,
                    max_generate_length))
            text_ids, codes, text_b = fronts[i]
            tails.append(self._batch_tail(
                text_ids, codes, text_b, refer_mel, keys[i][1], opts, k))

        hop = self.cfg.vocos.hop_length
        out = []
        for wav, code_lens in tails:
            wav = np.asarray(wav)
            out.append([wav[j, : code_lens[j] * 4 * hop]
                        for j in range(len(code_lens))])
        return out
