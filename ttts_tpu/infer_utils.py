"""Model registry / loader (reference ttts/utils/infer_utils.py:11-40).

`load_model(name, ckpt_dir, config)` builds the model definition and restores
weights from an Orbax checkpoint directory or a release .npz export. Unlike
the reference (which crashes on the vqvae path due to a config-key mismatch,
infer_utils.py:18-22 — SURVEY §2.10), configs are typed and validated.
"""

from __future__ import annotations

import pathlib
from typing import Optional, Tuple

from ttts_tpu.config import TTTSConfig, default_config


def build_model(name: str, cfg: Optional[TTTSConfig] = None):
    cfg = cfg or default_config()
    if name == "gpt":
        from ttts_tpu.models.gpt import UnifiedVoice

        return UnifiedVoice(cfg.gpt)
    if name == "vqvae":
        from ttts_tpu.models.vqvae import SynthesizerTrn

        return SynthesizerTrn(
            cfg.vqvae,
            spec_channels=cfg.audio.filter_length // 2 + 1,
            segment_frames=cfg.train.segment_size // cfg.audio.hop_length,
        )
    if name == "diffusion":
        from ttts_tpu.models.diffusion_net import AA_diffusion

        return AA_diffusion(cfg.diffusion_net)
    if name == "vocos":
        from ttts_tpu.models.vocos import Vocos

        return Vocos(cfg.vocos)
    if name == "clvp":
        from ttts_tpu.models.clvp import CLVP

        return CLVP(cfg.clvp)
    if name == "classifier":
        from ttts_tpu.models.classifier import AudioMiniEncoderWithClassifierHead

        return AudioMiniEncoderWithClassifierHead(cfg.classifier)
    raise KeyError(f"unknown model {name!r}")


def load_model(name: str, ckpt_path: Optional[str] = None,
               cfg: Optional[TTTSConfig] = None) -> Tuple:
    """Returns (model, variables) — variables None when no checkpoint given."""
    model = build_model(name, cfg)
    variables = None
    if ckpt_path:
        p = pathlib.Path(ckpt_path)
        if p.suffix == ".npz":
            from ttts_tpu.train.checkpoints import load_release

            tree, _ = load_release(p)
            variables = tree
        else:
            from ttts_tpu.train.checkpoints import CheckpointManager

            _, tree = CheckpointManager(p).restore()
            if tree is None:
                raise FileNotFoundError(f"no checkpoint under {p}")
            if "g" in tree:  # paired GAN checkpoint — generator side
                tree = tree["g"]
            if isinstance(tree, dict) and "params" in tree:
                inner = tree["params"]
                # TrainState.params holds the FULL flax variables dict
                # ({"params": ...}) for models init'd whole (mains.py) —
                # re-wrapping it would double-nest and crash apply()
                if isinstance(inner, dict) and "params" in inner:
                    variables = dict(inner)
                else:
                    variables = {"params": inner}
                if tree.get("extra_vars"):
                    variables.update(tree["extra_vars"])
            else:
                variables = tree
    if variables is not None:
        from ttts_tpu.models.quantize import rvq_state_from_dict

        # Orbax/npz restores flatten struct dataclasses to dicts; codebook
        # collections must be RVQState structs again before apply()
        variables = rvq_state_from_dict(variables)
    return model, variables
