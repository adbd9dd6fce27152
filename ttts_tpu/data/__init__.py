"""Host-side data pipeline: audio IO, jsonl manifests, datasets, bucketing."""

from ttts_tpu.data.audio import load_wav, save_wav, resample_audio, vad_split  # noqa: F401
