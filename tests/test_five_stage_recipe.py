"""The five-stage recipe, end-to-end, through the real CLIs.

The reference's behavioral contract is the pipeline in
ttts/train_step.py:1-7: tokenizer corpus → VQ-VAE → VQ extraction → GPT →
[CLVP] → diffusion → serve. Every stage here runs the actual entry points
(`ttts_tpu.data.prepare.pipeline`, `ttts_tpu.train.mains`,
`ttts_tpu.api.TextToSpeech.from_checkpoints`) against artifacts produced by
the previous stage — the glue (dataset→sampler→collate→init→Trainer→
checkpoint→load_model→serve) is exactly where config-key and shape-contract
bugs live (it bit-rotted the reference's own infer_utils.load_model('vqvae'),
ttts/utils/infer_utils.py:18-22).

Micro corpus: synthetic 32 kHz "speech" (tone+noise bursts with silence
gaps for the VAD), Chinese transcripts via an injected ASR hook (the
reference's ModelScope process boundary, asr_process.py:15-19). Tiny model
configs; a few optimizer steps per stage; minutes-scale on CPU.
"""

import json
import pathlib
import sys

if __name__ == "__main__":  # resumable dev/smoke driver (see bottom)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from ttts_tpu.config import (
    AcousticMelConfig,
    AudioConfig,
    CLVPConfig,
    DiffusionNetConfig,
    GPTConfig,
    TTTSConfig,
    TrainConfig,
    VQVAEConfig,
    VocosConfig,
    to_dict,
)
from ttts_tpu.data.audio import save_wav
from ttts_tpu.data.manifest import load_sidecar, read_manifest

pytestmark = pytest.mark.heavy  # compile-heavy; fast loop = -m "not heavy"

SR = 32000

RECIPE_CFG = TTTSConfig(
    audio=AudioConfig(sampling_rate=SR, filter_length=1024, hop_length=640,
                      win_length=1024, n_mel_channels=32),
    acoustic_mel=AcousticMelConfig(sample_rate=24000, n_fft=256, hop_length=256,
                                   n_mels=100),
    vqvae=VQVAEConfig(inter_channels=16, hidden_channels=16, filter_channels=32,
                      n_heads=2, n_layers=2, p_dropout=0.0,
                      upsample_initial_channel=32, gin_channels=16,
                      codebook_bins=32, posterior_wn_layers=2, flow_layers=1,
                      flow_wn_layers=1),
    gpt=GPTConfig(model_dim=64, layers=1, heads=2, max_text_tokens=64,
                  max_mel_tokens=128, number_mel_codes=1026,
                  start_mel_token=1024, stop_mel_token=1025),
    diffusion_net=DiffusionNetConfig(in_channels=100, out_channels=200,
                                     model_channels=64, num_heads=4,
                                     num_layers=1, in_latent_channels=64),
    clvp=CLVPConfig(dim_text=32, dim_speech=32, dim_latent=16,
                    num_text_tokens=256, num_speech_tokens=1026,
                    text_enc_depth=1, speech_enc_depth=1, text_heads=2,
                    speech_heads=2),
    vocos=VocosConfig(input_channels=100, dim=32, intermediate_dim=96,
                      num_layers=1, n_fft=1024, hop_length=256),
    train=TrainConfig(train_steps=3, save_freq=3, keep_ckpts=1, batch_size=2,
                      warmup_steps=1, segment_size=640 * 4, seed=0,
                      epochs=1),
)

TEXTS = ["你好世界朋友们", "今天天气真不错", "欢迎使用语音合成"]
# this image has no pypinyin (it's a data-prep-host dep, text/pinyin.py:37);
# after the ASR stage the test swaps in precomputed TONE3 pinyin so the
# datasets' romanization pass-through path is used instead
PINYIN = {
    "你好世界朋友们": "ni3 hao3 shi4 jie4 peng2 you3 men5",
    "今天天气真不错": "jin1 tian1 tian1 qi4 zhen1 bu4 cuo4",
    "欢迎使用语音合成": "huan1 ying2 shi3 yong4 yu3 yin1 he2 cheng2",
}


def _make_raw_corpus(raw_dir: pathlib.Path):
    """Three 'recordings', each = bursts separated by >0.5 s silence so the
    VAD (pipeline vad: min_silence 500 ms, -40 dB, 0.7-30 s keeps) yields
    multiple clips per file."""
    rng = np.random.default_rng(11)
    raw_dir.mkdir()
    sil = np.zeros(int(0.8 * SR), np.float32)
    for fi in range(3):
        bursts = []
        for bi in range(2):
            dur = 1.0 + 0.3 * fi + 0.2 * bi
            t = np.arange(int(dur * SR)) / SR
            tone = 0.2 * np.sin(2 * np.pi * (150 + 60 * fi + 30 * bi) * t)
            noise = 0.1 * rng.standard_normal(len(t))
            bursts += [sil, (tone + noise).astype(np.float32)]
        bursts.append(sil)
        save_wav(raw_dir / f"rec{fi}.wav", np.concatenate(bursts), SR)


def _write_asr_hook(tmp: pathlib.Path) -> str:
    """Injected transcribe() hook — the reference's ASR process boundary."""
    mod = tmp / "recipe_asr_hook.py"
    mod.write_text(
        "TEXTS = " + repr(TEXTS) + "\n"
        "def transcribe(path):\n"
        "    return TEXTS[hash(path) % len(TEXTS)]\n"
    )
    if str(tmp) not in sys.path:
        sys.path.insert(0, str(tmp))
    return "recipe_asr_hook"


def run_recipe(work, cfg=RECIPE_CFG, skip_existing=False):
    """Drive all five stages through the real CLIs inside `work`.

    skip_existing=True resumes a partially-completed work dir (a stage is
    skipped when its output artifact already exists) — used for iterating on
    late stages without re-paying the codec GAN compile, and by
    scripts/tpu_smoke.py to run the recipe on the chip."""
    import pathlib

    work = pathlib.Path(work)
    work.mkdir(parents=True, exist_ok=True)
    from ttts_tpu.data.prepare import pipeline
    from ttts_tpu.train import mains

    cfg_path = work / "cfg.json"
    cfg_path.write_text(json.dumps(to_dict(cfg)))

    # ---- stage 0a: VAD raw recordings into clips (prepare/vad_process.py)
    raw, clips = work / "raw", work / "clips"
    if not (skip_existing and clips.exists()):
        _make_raw_corpus(raw)
        pipeline.main(["vad", "--in-dir", str(raw), "--out-dir", str(clips)])
    n_clips = len(list(clips.glob("*.wav")))
    assert n_clips >= 4, f"VAD produced too few clips: {n_clips}"

    # ---- stage 0b: ASR → jsonl manifest (asr_process.py, injected backend)
    manifest = work / "data.jsonl"
    if not (skip_existing and manifest.exists()):
        hook = _write_asr_hook(work)
        pipeline.main(["asr", "--in-dir", str(clips), "--out", str(manifest),
                       "--hook", hook])
        rows = read_manifest(manifest)
        assert len(rows) == n_clips  # all Chinese, ≥5 chars → none filtered

        from ttts_tpu.text.pinyin import HAVE_PYPINYIN

        if not HAVE_PYPINYIN:
            from ttts_tpu.data.manifest import write_manifest

            rows = [{**r, "text": PINYIN[r["text"]]} for r in rows]
            write_manifest(manifest, rows)
    rows = read_manifest(manifest)

    # ---- stage 0c: BPE corpus merge (prepare/bpe_all_text_to_one_file.py)
    corpus = work / "bpe.txt"
    pipeline.main(["bpe-corpus", str(manifest), "--out", str(corpus)])
    assert len(corpus.read_text().strip().splitlines()) == len(rows)

    # ---- stage 1: train the VQ-VAE codec GAN (vqvae/train.py)
    logs_vqvae = work / "logs_vqvae"
    if not (skip_existing and (logs_vqvae / "ckpt").exists()):
        mains.main(["vqvae", "--config", str(cfg_path), "--manifest",
                    str(manifest), "--logs", str(logs_vqvae)])
    assert (logs_vqvae / "ckpt").exists()

    # ---- stage 1b: mel + VQ sidecar extraction with THAT checkpoint
    # (save_mel_to_disk.py + 2_save_vq_to_disk.py)
    if not (skip_existing
            and (pathlib.Path(rows[0]["path"] + ".vq.npy")).exists()):
        pipeline.main(["mel", "--manifest", str(manifest)])
        pipeline.main(["vq", "--manifest", str(manifest),
                       "--ckpt", str(logs_vqvae / "ckpt"),
                       "--config", str(cfg_path)])
    codes = load_sidecar(rows[0]["path"], "vq")
    assert codes is not None and codes.dtype == np.int32
    assert codes.min() >= 0 and codes.max() < cfg.vqvae.codebook_bins

    # ---- stage 2: train GPT on the VQ sidecars (gpt/train.py)
    logs_gpt = work / "logs_gpt"
    if not (skip_existing and (logs_gpt / "ckpt").exists()):
        mains.main(["gpt", "--config", str(cfg_path), "--manifest",
                    str(manifest), "--logs", str(logs_gpt)])
    assert (logs_gpt / "ckpt").exists()

    # ---- stage 2.5: train CLVP (clvp/train.py)
    logs_clvp = work / "logs_clvp"
    if not (skip_existing and (logs_clvp / "ckpt").exists()):
        mains.main(["clvp", "--config", str(cfg_path), "--manifest",
                    str(manifest), "--logs", str(logs_clvp)])
    assert (logs_clvp / "ckpt").exists()

    # ---- stage 3: train diffusion against the FROZEN GPT checkpoint
    # (diffusion/train.py:91 load_model('gpt'))
    logs_diff = work / "logs_diff"
    if not (skip_existing and (logs_diff / "ckpt").exists()):
        mains.main(["diffusion", "--config", str(cfg_path),
                    "--manifest", str(manifest),
                    "--gpt-ckpt", str(logs_gpt / "ckpt"),
                    "--logs", str(logs_diff)])
    assert (logs_diff / "ckpt").exists()

    # ---- stage 4a: fp16 release export of the codec generator
    # (process_ckpt.savee semantics)
    from ttts_tpu.infer_utils import load_model
    from ttts_tpu.train.checkpoints import export_release

    _, codec_vars = load_model("vqvae", str(logs_vqvae / "ckpt"), cfg)
    assert codec_vars is not None and "codebook" in codec_vars
    release = work / "codec_release.npz"
    export_release(codec_vars, release, drop_prefixes=("enc_q",),
                   config={"version": 2})

    # ---- stage 4b: serve from the trained checkpoints (api_zh.py flow);
    # codec loads from the RELEASE export, proving the savee→load contract
    from ttts_tpu.api import TextToSpeech

    tts = TextToSpeech.from_checkpoints(
        cfg,
        codec=release,
        gpt=logs_gpt / "ckpt",
        diffusion=logs_diff / "ckpt",
        clvp=logs_clvp / "ckpt",
        # vocos stays random-init: the reference serves the pretrained
        # charactr/vocos-mel-24khz, not a recipe-trained model
    )
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(SR) * 0.1).astype(np.float32)  # 1 s prompt
    wav = tts.tts("ni3 hao3 shi4 jie4", voice, SR, preset="ultra_fast",
                  max_generate_length=32, voice_cache_key="v0")
    assert wav.ndim == 1 and wav.shape[0] > 1000
    assert np.isfinite(wav).all()
    return {"manifest": manifest, "gpt": logs_gpt, "vqvae": logs_vqvae,
            "clvp": logs_clvp, "diffusion": logs_diff, "release": release,
            "wav": wav}


@pytest.mark.slow
def test_five_stage_recipe(tmp_path):
    run_recipe(tmp_path)


if __name__ == "__main__":
    # resumable dev driver: python tests/test_five_stage_recipe.py /tmp/recipe_dev
    # (CPU backend forced at the top of the file, like tests/conftest.py)
    work = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/recipe_dev")
    run_recipe(work, skip_existing=True)
    print("RECIPE OK")
