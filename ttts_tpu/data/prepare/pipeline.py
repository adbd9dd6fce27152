"""Offline preprocessing pipeline.

Rebuilds the reference's prepare stages (SURVEY §2.8 / §3.5) as subcommands:

  vad        — silence-split raw audio into 0.7–30 s clips at 32 kHz
               (1_vad_asr_save_to_jsonl.py phase 1 + vad_process.py:6-31;
               pydub → our native energy VAD)
  asr        — transcribe clips to a jsonl manifest. ASR is a pluggable host
               model (the reference hardcodes ModelScope Paraformer,
               asr_process.py:15-45; absent in this image → --hook module)
  mel        — write <wav>.mel.npy 24 kHz/100-bin sidecars on device
               (save_mel_to_disk.py + mel_extract.py:11)
  vq         — write <wav>.vq.npy semantic-code sidecars through the codec
               (2_save_vq_to_disk.py + extract_vq.py:13-23 — the GPT's
               training vocabulary)
  bpe-corpus — merge transcripts into a pinyin corpus for BPE training
               (prepare/bpe_all_text_to_one_file.py)
  filter-noise   — drop classifier-flagged rows (filter_noise_and_other_spk.py:23)
  filter-nohifreq— drop low-bandwidth audio by high-band STFT energy < 0.08
               (script/filter_nohifreq_data.py:8-21)

Unlike the reference's per-file GPU pools, mel/vq run batched under jit.
"""

from __future__ import annotations

import argparse
import pathlib
from typing import List, Optional

import numpy as np

from ttts_tpu.data.audio import load_wav, save_wav, vad_split
from ttts_tpu.data.manifest import read_manifest, save_sidecar, write_manifest
from ttts_tpu.text import text_to_pinyin
from ttts_tpu.utils.logging import get_logger

log = get_logger("prepare")


def cmd_vad(args):
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sr = 32000
    min_len, max_len = int(0.7 * sr), int(30 * sr)
    count = 0
    for path in sorted(pathlib.Path(args.in_dir).rglob("*.wav")):
        wav, _ = load_wav(path, target_sr=sr)
        for i, (s, e) in enumerate(vad_split(wav, sr, min_silence_ms=500,
                                             silence_thresh_db=-40)):
            clip = wav[s:e]
            if not (min_len <= len(clip) <= max_len):
                continue
            save_wav(out_dir / f"{path.stem}_{i:04d}.wav", clip, sr)
            count += 1
    log.info("vad: wrote %d clips to %s", count, out_dir)


def cmd_asr(args):
    rows = []
    transcribe = None
    if args.hook:
        import importlib

        transcribe = importlib.import_module(args.hook).transcribe
    for path in sorted(pathlib.Path(args.in_dir).rglob("*.wav")):
        if transcribe is None:
            raise SystemExit(
                "no ASR backend in this environment; pass --hook my_module "
                "exposing transcribe(path)->str (reference used ModelScope "
                "Paraformer, asr_process.py:15-19)"
            )
        text = transcribe(str(path))
        # reference filters: drop <5 chars or Latin-containing (asr_process.py:36-43)
        if text and len(text) >= 5 and not any("a" <= ch.lower() <= "z" for ch in text):
            rows.append({"text": text, "path": str(path)})
    write_manifest(args.out, rows)
    log.info("asr: %d rows → %s", len(rows), args.out)


def cmd_mel(args):
    import jax.numpy as jnp

    from ttts_tpu.ops.mel import acoustic_mel_spectrogram

    rows = read_manifest(args.manifest)
    for row in rows:
        wav, _ = load_wav(row["path"], target_sr=24000)
        mel = acoustic_mel_spectrogram(jnp.asarray(wav)[None])  # (1, 100, T)
        save_sidecar(row["path"], "mel", np.asarray(mel)[0])
    log.info("mel: wrote %d sidecars", len(rows))


def cmd_vq(args):
    import jax
    import jax.numpy as jnp

    from ttts_tpu.config import default_config, load_config
    from ttts_tpu.models.vqvae import SynthesizerTrn
    from ttts_tpu.ops.mel import vits_spectrogram
    from ttts_tpu.train.checkpoints import CheckpointManager

    cfg = load_config(args.config) if args.config else default_config()
    a = cfg.audio
    codec = SynthesizerTrn(cfg.vqvae, spec_channels=a.filter_length // 2 + 1,
                           segment_frames=cfg.train.segment_size // a.hop_length)
    _, tree = CheckpointManager(args.ckpt).restore()
    variables = tree["g"] if "g" in tree else tree
    if "params" in variables and "extra_vars" in variables:  # TrainState tree
        variables = {"params": variables["params"], **variables["extra_vars"]}
    from ttts_tpu.models.quantize import rvq_state_from_dict

    variables = rvq_state_from_dict(variables)  # re-struct restored codebooks

    extract = jax.jit(
        lambda wav, spec, sl: codec.apply(variables, wav, spec, sl,
                                          method=codec.extract_code)
    )
    rows = read_manifest(args.manifest)
    for row in rows:
        wav, _ = load_wav(row["path"], target_sr=a.sampling_rate)
        t = (len(wav) // a.hop_length) * a.hop_length
        wav = jnp.asarray(wav[:t])[None]
        spec = vits_spectrogram(wav, a.filter_length, a.hop_length, a.win_length)
        spec = spec.swapaxes(1, 2)
        codes = extract(wav[..., None], spec, jnp.asarray([spec.shape[1]]))
        save_sidecar(row["path"], "vq", np.asarray(codes)[0, 0].astype(np.int32))
    log.info("vq: wrote %d sidecars", len(rows))


def cmd_bpe_corpus(args):
    lines = []
    for manifest in args.manifests:
        for row in read_manifest(manifest):
            lines.append(text_to_pinyin(row["text"]))
    with open(args.out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    log.info("bpe-corpus: %d lines → %s", len(lines), args.out)


def cmd_filter_noise(args):
    noise = set()
    with open(args.noise_files) as f:
        noise = {l.strip() for l in f if l.strip()}
    rows = [r for r in read_manifest(args.manifest) if r["path"] not in noise]
    write_manifest(args.out, rows)
    log.info("filter-noise: kept %d rows → %s", len(rows), args.out)


def cmd_filter_nohifreq(args):
    """High-band energy filter (script/filter_nohifreq_data.py:8-21):
    mean magnitude of the top ~2 kHz of a 22 kHz-wide STFT < 0.08 → flag."""
    import jax.numpy as jnp

    from ttts_tpu.ops.stft import stft

    flagged = []
    for row in read_manifest(args.manifest):
        wav, sr = load_wav(row["path"])
        if len(wav) < 22050:
            continue
        n_fft = min(22000, 2 ** int(np.log2(max(len(wav) - 1, 2))))
        spec = stft(jnp.asarray(wav)[None], n_fft, 1024, n_fft, center=True)
        mag = jnp.abs(spec)[0, -2000:, :]
        if float(mag.mean()) < 0.08:
            flagged.append(row["path"])
    with open(args.out, "w") as f:
        f.write("\n".join(flagged) + "\n")
    log.info("filter-nohifreq: flagged %d files", len(flagged))


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("vad")
    s.add_argument("--in-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.set_defaults(fn=cmd_vad)

    s = sub.add_parser("asr")
    s.add_argument("--in-dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--hook", default=None)
    s.set_defaults(fn=cmd_asr)

    s = sub.add_parser("mel")
    s.add_argument("--manifest", required=True)
    s.set_defaults(fn=cmd_mel)

    s = sub.add_parser("vq")
    s.add_argument("--manifest", required=True)
    s.add_argument("--ckpt", required=True)
    s.add_argument("--config", default=None)
    s.set_defaults(fn=cmd_vq)

    s = sub.add_parser("bpe-corpus")
    s.add_argument("manifests", nargs="+")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_bpe_corpus)

    s = sub.add_parser("filter-noise")
    s.add_argument("--manifest", required=True)
    s.add_argument("--noise-files", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_filter_noise)

    s = sub.add_parser("filter-nohifreq")
    s.add_argument("--manifest", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_filter_nohifreq)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
