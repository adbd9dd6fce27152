"""Torch checkpoint porting utilities.

The reference's UnifiedVoice wraps HF GPT2Model (model.py:245-265); porting a
trained checkpoint to this framework means mapping GPT-2 block weights (fused
c_attn QKV, Conv1D-style transposed linears) onto our GPT2Stack, plus the
embedding/pos-table/head tensors. These helpers do that mapping; the HF-parity
test (tests/test_porting.py) validates the block math end-to-end.

torch Conv1D (GPT-2's linear) stores weight as (in, out) — same orientation
as flax Dense kernels, so no transpose; torch nn.Linear heads are (out, in).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def port_hf_gpt2_state(state_dict: Dict[str, "np.ndarray"], layers: int) -> Dict:
    """Map an HF GPT2Model state dict (already as numpy) onto our GPT2Stack
    params {'GPT2Block_i': {...}}. Positional/token embeddings are NOT mapped
    (the reference deletes them, model.py:258-263)."""
    g = lambda k: np.asarray(state_dict[k])
    out = {}
    for i in range(layers):
        p = f"h.{i}."
        out[f"GPT2Block_{i}"] = {
            "LayerNorm_0": {"scale": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")},
            "Dense_0": {"kernel": g(p + "attn.c_attn.weight"),
                        "bias": g(p + "attn.c_attn.bias")},
            "Dense_1": {"kernel": g(p + "attn.c_proj.weight"),
                        "bias": g(p + "attn.c_proj.bias")},
            "LayerNorm_1": {"scale": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")},
            "Dense_2": {"kernel": g(p + "mlp.c_fc.weight"),
                        "bias": g(p + "mlp.c_fc.bias")},
            "Dense_3": {"kernel": g(p + "mlp.c_proj.weight"),
                        "bias": g(p + "mlp.c_proj.bias")},
        }
    if "ln_f.weight" in state_dict:
        out["ln_f"] = {"scale": g("ln_f.weight"), "bias": g("ln_f.bias")}
    return out


def port_unified_voice_state(state_dict: Dict[str, "np.ndarray"], layers: int) -> Dict:
    """Map a reference UnifiedVoice torch checkpoint (text/mel embeddings,
    dual pos tables, GPT blocks, final norm, heads — model.py:333-349) onto
    our UnifiedVoice params."""
    g = lambda k: np.asarray(state_dict[k])
    params = {
        "text_embedding": {"embedding": g("text_embedding.weight")},
        "mel_embedding": {"embedding": g("mel_embedding.weight")},
        "text_pos_embedding": g("text_pos_embedding.emb.weight"),
        "mel_pos_embedding": g("mel_pos_embedding.emb.weight"),
        "final_norm": {"scale": g("final_norm.weight"), "bias": g("final_norm.bias")},
        "text_head": {"kernel": g("text_head.weight").T, "bias": g("text_head.bias")},
        "mel_head": {"kernel": g("mel_head.weight").T, "bias": g("mel_head.bias")},
    }
    gpt_sd = {k[len("gpt."):]: v for k, v in state_dict.items() if k.startswith("gpt.")}
    # our stack nests blocks under 'gpt'; ln_f is mapped when present
    params["gpt"] = port_hf_gpt2_state(gpt_sd, layers)
    return params
