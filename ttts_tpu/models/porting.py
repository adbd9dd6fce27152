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


# ---------------------------------------------------------------------------
# Torch conv / weight-norm primitives
#
# The codec checkpoints mix three weight storage styles:
#   plain:      '<p>.weight'
#   old-style   torch.nn.utils.weight_norm (vq2.py: Generator.ups,
#               PosteriorAudioEncoder.downs): '<p>.weight_g' + '<p>.weight_v'
#   new-style   torch.nn.utils.parametrizations.weight_norm (modules.py: WN,
#               ResBlock1): '<p>.parametrizations.weight.original0/original1'
# ---------------------------------------------------------------------------


def _conv_wg(sd: Dict, p: str):
    """Return (v, g) for a possibly weight-normed torch conv at prefix ``p``.
    g is None for plain convs. Shapes: v (O, I, K); g (O, 1, 1)."""
    if p + ".weight" in sd:
        return np.asarray(sd[p + ".weight"]), None
    if p + ".weight_v" in sd:
        return np.asarray(sd[p + ".weight_v"]), np.asarray(sd[p + ".weight_g"])
    return (
        np.asarray(sd[p + ".parametrizations.weight.original1"]),
        np.asarray(sd[p + ".parametrizations.weight.original0"]),
    )


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (O, I, K) → flax Conv kernel (K, I, O)."""
    return np.transpose(w, (2, 1, 0))


def _conv(sd: Dict, p: str) -> Dict:
    """Map a torch Conv1d at ``p`` onto our blocks.Conv1d param subtree.

    Weight-normed convs fill both the inner kernel (= direction v) and the
    flax nn.WeightNorm scale (= g): both frameworks compute g·v/‖v‖ with the
    norm over everything but the output-channel axis."""
    v, g = _conv_wg(sd, p)
    inner: Dict = {"kernel": _t_conv(v)}
    if p + ".bias" in sd:
        inner["bias"] = np.asarray(sd[p + ".bias"])
    out: Dict = {"Conv_0": inner}
    if g is not None:
        out["WeightNorm_0"] = {"Conv_0/kernel/scale": g.reshape(-1)}
    return out


def _convT(sd: Dict, p: str) -> Dict:
    """torch ConvTranspose1d (weight (I, O, K), weight-norm over dim 0 = I)
    → our blocks.ConvTranspose1d {kernel (K, I, O), g (O,), bias}.

    torch normalizes per *input* channel while ours normalizes per output
    channel, so the weight is fused first and our g is set to the fused
    kernel's per-output norm (making the effective weight exactly the fused
    one)."""
    v, g = _conv_wg(sd, p)
    if g is not None:
        norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    else:
        w = v
    kernel = np.transpose(w, (2, 0, 1))  # (K, I, O)
    out_ch = kernel.shape[-1]
    out = {
        "kernel": kernel,
        "g": np.sqrt((kernel.reshape(-1, out_ch) ** 2).sum(0)),
    }
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _dense(sd: Dict, p: str) -> Dict:
    """torch nn.Linear (out, in) → flax Dense."""
    out = {"kernel": np.asarray(sd[p + ".weight"]).T}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _linear_as_conv1x1(sd: Dict, p: str) -> Dict:
    """torch nn.Linear → our 1×1 blocks.Conv1d (kernel (1, in, out))."""
    w = np.asarray(sd[p + ".weight"])  # (out, in)
    out: Dict = {"Conv_0": {"kernel": w.T[None]}}
    if p + ".bias" in sd:
        out["Conv_0"]["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _conv1x1_as_dense(sd: Dict, p: str) -> Dict:
    """torch 1×1 Conv1d (out, in, 1) → flax Dense (in, out)."""
    w = np.asarray(sd[p + ".weight"])[:, :, 0]
    out = {"kernel": w.T}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _layernorm(sd: Dict, p: str) -> Dict:
    """modules.LayerNorm gamma/beta → flax LayerNorm scale/bias."""
    return {"scale": np.asarray(sd[p + ".gamma"]), "bias": np.asarray(sd[p + ".beta"])}


# ---------------------------------------------------------------------------
# Codec building-block porters (ttts/vqvae/{modules,attentions}.py → blocks.py)
# ---------------------------------------------------------------------------


def _wn(sd: Dict, p: str, n_layers: int, gin: bool = True) -> Dict:
    """modules.WN → blocks.WN. Layout: Conv1d_0 = cond_layer (when gin),
    then alternating in_layers/res_skip_layers."""
    out: Dict = {}
    base = 0
    if gin:
        out["Conv1d_0"] = _conv(sd, p + ".cond_layer")
        base = 1
    for i in range(n_layers):
        out[f"Conv1d_{base + 2 * i}"] = _conv(sd, f"{p}.in_layers.{i}")
        out[f"Conv1d_{base + 2 * i + 1}"] = _conv(sd, f"{p}.res_skip_layers.{i}")
    return out


def _resblock1(sd: Dict, p: str, n_dil: int = 3) -> Dict:
    """modules.ResBlock1 → blocks.ResBlock1 (convs1/convs2 interleaved)."""
    out: Dict = {}
    for j in range(n_dil):
        out[f"Conv1d_{2 * j}"] = _conv(sd, f"{p}.convs1.{j}")
        out[f"Conv1d_{2 * j + 1}"] = _conv(sd, f"{p}.convs2.{j}")
    return out


def _vits_mha(sd: Dict, p: str, windowed: bool = False) -> Dict:
    """attentions/vc_utils MultiHeadAttention → RelPosMultiHeadAttention."""
    out = {
        "Conv1d_0": _conv(sd, p + ".conv_q"),
        "Conv1d_1": _conv(sd, p + ".conv_k"),
        "Conv1d_2": _conv(sd, p + ".conv_v"),
        "Conv1d_3": _conv(sd, p + ".conv_o"),
    }
    if windowed:
        out["emb_rel_k"] = np.asarray(sd[p + ".emb_rel_k"])
        out["emb_rel_v"] = np.asarray(sd[p + ".emb_rel_v"])
    return out


def _vits_encoder(sd: Dict, p: str, n_layers: int) -> Dict:
    """attentions.Encoder → blocks.TransformerEncoder."""
    out: Dict = {}
    for i in range(n_layers):
        out[f"RelPosMultiHeadAttention_{i}"] = _vits_mha(
            sd, f"{p}.attn_layers.{i}", windowed=True
        )
        out[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"{p}.norm_layers_1.{i}")
        out[f"ConvFFN_{i}"] = {
            "Conv1d_0": _conv(sd, f"{p}.ffn_layers.{i}.conv_1"),
            "Conv1d_1": _conv(sd, f"{p}.ffn_layers.{i}.conv_2"),
        }
        out[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"{p}.norm_layers_2.{i}")
    return out


def _mel_style_encoder(sd: Dict, p: str) -> Dict:
    """modules.MelStyleEncoder → blocks.MelStyleEncoder."""
    return {
        "Dense_0": _dense(sd, p + ".spectral.0.fc"),
        "Dense_1": _dense(sd, p + ".spectral.3.fc"),
        "Conv1dGLU_0": {"Conv1d_0": _conv(sd, p + ".temporal.0.conv1.conv")},
        "Conv1dGLU_1": {"Conv1d_0": _conv(sd, p + ".temporal.1.conv1.conv")},
        "RelPosMultiHeadAttention_0": {
            "Conv1d_0": _linear_as_conv1x1(sd, p + ".slf_attn.w_qs"),
            "Conv1d_1": _linear_as_conv1x1(sd, p + ".slf_attn.w_ks"),
            "Conv1d_2": _linear_as_conv1x1(sd, p + ".slf_attn.w_vs"),
            "Conv1d_3": _linear_as_conv1x1(sd, p + ".slf_attn.fc"),
        },
        "Dense_2": _dense(sd, p + ".fc.fc"),
    }


def _posterior_audio_encoder(
    sd: Dict, p: str, n_down: int = 5, n_rb: int = 3, wn_layers: int = 16
) -> Dict:
    """vq2.PosteriorAudioEncoder → vqvae.PosteriorAudioEncoder."""
    out: Dict = {"Conv1d_0": _conv(sd, p + ".down_pre")}
    for i in range(n_down):
        out[f"Conv1d_{i + 1}"] = _conv(sd, f"{p}.downs.{i}")
        for j in range(n_rb):
            out[f"ResBlock1_{i * n_rb + j}"] = _resblock1(
                sd, f"{p}.resblocks.{i * n_rb + j}", n_dil=3
            )
    out["AntiAliasedActivation_0"] = {
        "SnakeBeta_0": {
            "log_alpha": np.asarray(sd[p + ".activation_post.act.alpha"]),
            "log_beta": np.asarray(sd[p + ".activation_post.act.beta"]),
        }
    }
    out[f"Conv1d_{n_down + 1}"] = _conv(sd, p + ".conv_post")
    out[f"Conv1d_{n_down + 2}"] = _conv(sd, p + ".pre")
    out["WN_0"] = _wn(sd, p + ".enc", wn_layers)
    out[f"Conv1d_{n_down + 3}"] = _conv(sd, p + ".proj")
    return out


def _generator(sd: Dict, p: str, n_up: int = 5, n_rb: int = 3) -> Dict:
    """vq2.Generator (HiFi-GAN) → vqvae.Generator."""
    out: Dict = {
        "Conv1d_0": _conv(sd, p + ".conv_pre"),
        "Conv1d_1": _conv(sd, p + ".cond"),
        "Conv1d_2": _conv(sd, p + ".conv_post"),
    }
    for i in range(n_up):
        out[f"ConvTranspose1d_{i}"] = _convT(sd, f"{p}.ups.{i}")
        for j in range(n_rb):
            out[f"ResBlock1_{i * n_rb + j}"] = _resblock1(
                sd, f"{p}.resblocks.{i * n_rb + j}", n_dil=3
            )
    return out


def _text_encoder(sd: Dict, p: str, n_layers: int = 6) -> Dict:
    """vq2.TextEncoder → vqvae.TextEncoder (encoder_ssl/text/2 + MRTE)."""
    return {
        "TransformerEncoder_0": _vits_encoder(sd, p + ".encoder_ssl", n_layers // 2),
        "Embed_0": {"embedding": np.asarray(sd[p + ".text_embedding.weight"])},
        "TransformerEncoder_1": _vits_encoder(sd, p + ".encoder_text", n_layers),
        "MRTE_0": {
            "Conv1d_0": _conv(sd, p + ".mrte.c_pre"),
            "Conv1d_1": _conv(sd, p + ".mrte.text_pre"),
            "RelPosMultiHeadAttention_0": _vits_mha(sd, p + ".mrte.cross_attention"),
            "Conv1d_2": _conv(sd, p + ".mrte.c_post"),
        },
        "TransformerEncoder_2": _vits_encoder(sd, p + ".encoder2", n_layers // 2),
        "Conv1d_0": _conv(sd, p + ".proj"),
    }


def _coupling_flow(sd: Dict, p: str, n_flows: int, wn_layers: int) -> Dict:
    """ResidualCouplingBlock → our flow subtree. flows.{2i} are coupling
    layers (pre/enc/post), flows.{2i+1} are parameter-free Flips."""
    out: Dict = {}
    for i in range(n_flows):
        fp = f"{p}.flows.{2 * i}"
        out[f"ResidualCouplingLayer_{i}"] = {
            "Conv1d_0": _conv(sd, fp + ".pre"),
            "WN_0": _wn(sd, fp + ".enc", wn_layers),
            "Dense_0": _conv1x1_as_dense(sd, fp + ".post"),
        }
    return out


def port_synthesizer_trn_state(
    state_dict: Dict[str, "np.ndarray"],
    n_layers: int = 6,
    n_flows: int = 4,
    flow_wn_layers: int = 4,
    posterior_wn_layers: int = 16,
) -> Dict:
    """Map a reference SynthesizerTrn torch state dict (ttts/vqvae/vq2.py:749)
    onto our models.vqvae.SynthesizerTrn variables {'params', 'codebook'}.

    Covers ref_enc (MelStyleEncoder), enc_p/enc_q (PosteriorAudioEncoder),
    enc_p_2 (TextEncoder+MRTE), flow (coupling stack), dec (HiFi-GAN), proj,
    and the EnCodec RVQ codebook buffers."""
    from ttts_tpu.models.quantize import RVQState

    sd = state_dict
    params: Dict = {
        "ref_enc": _mel_style_encoder(sd, "ref_enc"),
        "enc_p": _posterior_audio_encoder(sd, "enc_p", wn_layers=posterior_wn_layers),
        "enc_q": _posterior_audio_encoder(sd, "enc_q", wn_layers=posterior_wn_layers),
        "enc_p_2": _text_encoder(sd, "enc_p_2", n_layers=n_layers),
        "dec": _generator(sd, "dec"),
        "proj": _conv(sd, "proj"),
        "flow": _coupling_flow(sd, "flow", n_flows, flow_wn_layers),
    }

    cb = "quantizer.vq.layers.0._codebook"
    state = RVQState(
        embed=np.asarray(sd[cb + ".embed"])[None].astype(np.float32),
        embed_avg=np.asarray(sd[cb + ".embed_avg"])[None].astype(np.float32),
        cluster_size=np.asarray(sd[cb + ".cluster_size"])[None].astype(np.float32),
        inited=np.asarray(sd[cb + ".inited"]).reshape(()).astype(bool),
    )
    return {"params": params, "codebook": {"quantizer": {"state": state}}}


# ---------------------------------------------------------------------------
# AA_diffusion porter (ttts/diffusion/aa_model.py:182 → models/diffusion_net.py)
# ---------------------------------------------------------------------------


def _conv_flax(sd: Dict, p: str) -> Dict:
    """Plain torch Conv1d → bare flax nn.Conv {kernel, bias}."""
    out = {"kernel": _t_conv(np.asarray(sd[p + ".weight"]))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _gn32(sd: Dict, p: str) -> Dict:
    """torch GroupNorm → our GroupNorm32 wrapper subtree."""
    return {"GroupNorm_0": {"scale": np.asarray(sd[p + ".weight"]),
                            "bias": np.asarray(sd[p + ".bias"])}}


def _attn_block(sd: Dict, p: str) -> Dict:
    """utils.AttentionBlock:172-215 → diffusion_net.AttentionBlock
    (fused qkv 1×1 conv → Dense; T5 rel-pos bias table)."""
    out = {
        "norm": _gn32(sd, p + ".norm"),
        "qkv": _conv1x1_as_dense(sd, p + ".qkv"),
        "proj": _conv1x1_as_dense(sd, p + ".proj_out"),
    }
    rel = p + ".relative_pos_embeddings.relative_attention_bias.weight"
    if rel in sd:
        out["relpos"] = {"table": {"embedding": np.asarray(sd[rel])}}
    return out


def _ss_resblock(sd: Dict, p: str) -> Dict:
    """aa_model.ResBlock (use_scale_shift_norm, efficient 1×1 in/skip) →
    diffusion_net.ScaleShiftResBlock."""
    return {
        "GroupNorm32_0": _gn32(sd, p + ".in_layers.0"),
        "Dense_0": _conv1x1_as_dense(sd, p + ".in_layers.2"),
        "Dense_1": _dense(sd, p + ".emb_layers.1"),
        "GroupNorm32_1": _gn32(sd, p + ".out_layers.0"),
        "Conv_0": _conv_flax(sd, p + ".out_layers.3"),
    }


def _diffusion_layer(sd: Dict, p: str) -> Dict:
    return {"resblk": _ss_resblock(sd, p + ".resblk"),
            "attn": _attn_block(sd, p + ".attn")}


def _ref_encoder(sd: Dict, p: str) -> Dict:
    """aa_model.RefEncoder:150-178 → diffusion_net.RefEncoder."""
    return {
        "latents": np.asarray(sd[p + ".latents"]),
        "Dense_0": _conv1x1_as_dense(sd, p + ".cross_attention.conv_q"),
        "Dense_1": _conv1x1_as_dense(sd, p + ".cross_attention.conv_k"),
        "Dense_2": _conv1x1_as_dense(sd, p + ".cross_attention.conv_v"),
        "Dense_3": _conv1x1_as_dense(sd, p + ".cross_attention.conv_o"),
        "Conv_0": _conv_flax(sd, p + ".enc.0"),
        **{f"AttentionBlock_{i}": _attn_block(sd, f"{p}.enc.{i + 1}") for i in range(4)},
    }


def _clvp_plain_encoder(sd: Dict, p: str, depth: int) -> Dict:
    """utils/transformer.py Transformer → clvp.PlainEncoder.
    Layer i lives at {p}.layers.layers.{i}: [0]=LayerScale(PreNorm(Attention)),
    [1]=LayerScale(PreNorm(FeedForward))."""
    out: Dict = {}
    for i in range(depth):
        lp = f"{p}.layers.layers.{i}"
        out[f"PlainEncoderLayer_{i}"] = {
            "LayerNorm_0": {"scale": np.asarray(sd[f"{lp}.0.fn.norm.weight"]),
                            "bias": np.asarray(sd[f"{lp}.0.fn.norm.bias"])},
            "Dense_0": {"kernel": np.asarray(sd[f"{lp}.0.fn.fn.to_qkv.weight"]).T},
            "Dense_1": _dense(sd, f"{lp}.0.fn.fn.to_out.0"),
            "attn_gamma": np.asarray(sd[f"{lp}.0.scale"]),
            "LayerNorm_1": {"scale": np.asarray(sd[f"{lp}.1.fn.norm.weight"]),
                            "bias": np.asarray(sd[f"{lp}.1.fn.norm.bias"])},
            "Dense_2": _dense(sd, f"{lp}.1.fn.fn.net.0"),
            "Dense_3": _dense(sd, f"{lp}.1.fn.fn.net.3"),
            "ff_gamma": np.asarray(sd[f"{lp}.1.scale"]),
        }
    return out


def _clvp_xformers_encoder(sd: Dict, p: str, depth: int) -> Dict:
    """CheckpointedXTransformerEncoder (utils/utils.py:442) →
    clvp.CLVPEncoder. Torch layout: {p}.transformer.attn_layers.layers.{j} =
    [norms, CheckpointedLayer(block), residual]; even j = Attention, odd j =
    GLU FeedForward; {p}.transformer.norm = the wrapper's final LayerNorm
    (xtransformers.py:1213). The rotary inv_freq buffer is deterministic —
    nothing to port."""
    out: Dict = {}
    for i in range(depth):
        ap = f"{p}.transformer.attn_layers.layers.{2 * i}"
        fp = f"{p}.transformer.attn_layers.layers.{2 * i + 1}"
        out[f"EncoderLayer_{i}"] = {
            "RMSNorm_0": {"scale": np.asarray(sd[f"{ap}.0.0.g"])},
            "Dense_0": {"kernel": np.asarray(sd[f"{ap}.1.wrap.to_q.weight"]).T},
            "Dense_1": {"kernel": np.asarray(sd[f"{ap}.1.wrap.to_k.weight"]).T},
            "Dense_2": {"kernel": np.asarray(sd[f"{ap}.1.wrap.to_v.weight"]).T},
            "Dense_3": _dense(sd, f"{ap}.1.wrap.to_out"),
            "RMSNorm_1": {"scale": np.asarray(sd[f"{fp}.0.0.g"])},
            # GLU: one 2×-wide projection; chunk order value-then-gate is
            # preserved by porting the whole kernel (xtransformers.py:432-436)
            "Dense_4": _dense(sd, f"{fp}.1.wrap.net.0.proj"),
            "Dense_5": _dense(sd, f"{fp}.1.wrap.net.3"),
        }
    out["LayerNorm_0"] = {"scale": np.asarray(sd[p + ".transformer.norm.weight"]),
                          "bias": np.asarray(sd[p + ".transformer.norm.bias"])}
    return out


def port_clvp_xformers_state(state_dict: Dict[str, "np.ndarray"],
                             text_depth: int = 6,
                             speech_depth: int = 6) -> Dict:
    """Map a reference CLVP torch state dict with use_xformers=True (the
    api.py:208 serving configuration, ttts/clvp/model.py:53-83) onto our
    params (models/clvp.py CLVPEncoder path — no position tables)."""
    sd = state_dict
    return {
        "Embed_0": {"embedding": np.asarray(sd["text_emb.weight"])},
        "Embed_1": {"embedding": np.asarray(sd["speech_emb.weight"])},
        "CLVPEncoder_0": _clvp_xformers_encoder(sd, "text_transformer", text_depth),
        "CLVPEncoder_1": _clvp_xformers_encoder(sd, "speech_transformer",
                                                speech_depth),
        "Dense_0": {"kernel": np.asarray(sd["to_text_latent.weight"]).T},
        "Dense_1": {"kernel": np.asarray(sd["to_speech_latent.weight"]).T},
        "temperature": np.asarray(sd["temperature"]).reshape(()),
    }


def port_clvp_state(state_dict: Dict[str, "np.ndarray"], text_depth: int = 20,
                    speech_depth: int = 20) -> Dict:
    """Map a reference CLVP torch state dict (ttts/clvp/model.py:19, the
    use_xformers=False variant the v2 trainer instantiates) onto our params."""
    sd = state_dict
    return {
        "Embed_0": {"embedding": np.asarray(sd["text_emb.weight"])},
        "Embed_1": {"embedding": np.asarray(sd["speech_emb.weight"])},
        "text_pos_emb": np.asarray(sd["text_pos_emb.weight"]),
        "speech_pos_emb": np.asarray(sd["speech_pos_emb.weight"]),
        "PlainEncoder_0": _clvp_plain_encoder(sd, "text_transformer", text_depth),
        "PlainEncoder_1": _clvp_plain_encoder(sd, "speech_transformer", speech_depth),
        "Dense_0": {"kernel": np.asarray(sd["to_text_latent.weight"]).T},
        "Dense_1": {"kernel": np.asarray(sd["to_speech_latent.weight"]).T},
        "temperature": np.asarray(sd["temperature"]).reshape(()),
    }


def port_aa_diffusion_state(state_dict: Dict[str, "np.ndarray"],
                            num_layers: int = 6) -> Dict:
    """Map a reference AA_diffusion torch state dict onto our params tree."""
    sd = state_dict
    params: Dict = {
        "inp_block": _conv_flax(sd, "inp_block"),
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_1": _dense(sd, "time_embed.2"),
        "code_norm": _gn32(sd, "code_norm"),
        "latent_conditioner_0": _conv_flax(sd, "latent_conditioner.0"),
        "unconditioned_embedding": np.asarray(
            sd["unconditioned_embedding"]).transpose(0, 2, 1),
        "refer_conv": _conv_flax(sd, "refer_enc.0"),
        "refer_pool": _ref_encoder(sd, "refer_enc.4"),
        "integrating_conv": _conv1x1_as_dense(sd, "integrating_conv"),
        "out_norm": _gn32(sd, "out.0"),
        "out_conv": _conv_flax(sd, "out.2"),
    }
    for i in range(3):
        params[f"latent_conditioner_{i + 1}"] = _attn_block(
            sd, f"latent_conditioner.{i + 1}")
        params[f"refer_attn_{i}"] = _attn_block(sd, f"refer_enc.{i + 1}")
        params[f"conditioning_timestep_integrator_{i}"] = _diffusion_layer(
            sd, f"conditioning_timestep_integrator.{i}")
    for i in range(num_layers):
        params[f"layers_{i}"] = _diffusion_layer(sd, f"layers.{i}")
    for i in range(3):
        params[f"layers_{num_layers + i}"] = _ss_resblock(
            sd, f"layers.{num_layers + i}")
    return params


# ---------------------------------------------------------------------------
# RVQ1 porter (ttts/vqvae/rvq1.py:234 → models/rvq1.py) — the inference codec
# whose extract_code produces the `.vq` sidecars (prepare/extract_vq.py:20)
# ---------------------------------------------------------------------------


def _wn_encoder(sd: Dict, p: str, wn_layers: int = 16) -> Dict:
    """rvq1 SemanticEncoder/SpecEncoder (in_proj → WN → proj) → rvq1.WNEncoder."""
    return {
        "Conv1d_0": _conv(sd, p + ".in_proj"),
        "WN_0": _wn(sd, p + ".enc", wn_layers),
        "Conv1d_1": _conv(sd, p + ".proj"),
    }


def _rvq1_ref_encoder(sd: Dict, p: str) -> Dict:
    """rvq1.RefEncoder:20-45 (latent cross-attn + conv + 2 AttentionBlocks)."""
    return {
        "latents": np.asarray(sd[p + ".latents"]),
        "Dense_0": _conv1x1_as_dense(sd, p + ".cross_attention.conv_q"),
        "Dense_1": _conv1x1_as_dense(sd, p + ".cross_attention.conv_k"),
        "Dense_2": _conv1x1_as_dense(sd, p + ".cross_attention.conv_v"),
        "Dense_3": _conv1x1_as_dense(sd, p + ".cross_attention.conv_o"),
        "Conv_0": _conv_flax(sd, p + ".enc.0"),
        "AttentionBlock_0": _attn_block(sd, p + ".enc.1"),
        "AttentionBlock_1": _attn_block(sd, p + ".enc.2"),
    }


def _rvq1_text_encoder(sd: Dict, p: str, num_layers: int = 3) -> Dict:
    """rvq1.TextEncoder:84-123 → rvq1.RVQ1TextEncoder."""
    out: Dict = {"Conv_0": _conv_flax(sd, p + ".enc1.0"),
                 "latents": np.asarray(sd[p + ".latents"])}
    for i in range(num_layers):
        out[f"AttentionBlock_{i}"] = _attn_block(sd, f"{p}.enc1.{i + 1}")
        out[f"AttentionBlock_{num_layers + i}"] = _attn_block(sd, f"{p}.enc2.{i}")
    out["MRTE1_0"] = {
        "Dense_0": _conv1x1_as_dense(sd, p + ".mrte.ge_enc.0"),
        "Conv_0": _conv_flax(sd, p + ".mrte.mel_enc.0"),
        "Conv1d_0": _conv(sd, p + ".mrte.text_pre.0"),
        "Dense_1": _conv1x1_as_dense(sd, p + ".mrte.cross_attention.conv_q"),
        "Dense_2": _conv1x1_as_dense(sd, p + ".mrte.cross_attention.conv_k"),
        "Dense_3": _conv1x1_as_dense(sd, p + ".mrte.cross_attention.conv_v"),
        "Dense_4": _conv1x1_as_dense(sd, p + ".mrte.cross_attention.conv_o"),
        "Conv1d_1": _conv(sd, p + ".mrte.c_post"),
    }
    out["Conv1d_0"] = _conv(sd, p + ".proj")
    return out


def port_rvq1_state(state_dict: Dict[str, "np.ndarray"], wn_layers: int = 16,
                    n_flows: int = 4, flow_wn_layers: int = 4) -> Dict:
    """Map a reference RVQ1 torch state dict onto our models.rvq1.RVQ1
    variables {'params', 'codebook'}."""
    from ttts_tpu.models.quantize import RVQState

    sd = state_dict
    params: Dict = {
        "semantic_proj": _conv(sd, "semantic_proj"),
        "text_enc": _rvq1_text_encoder(sd, "text_enc"),
        "semantic_enc": _wn_encoder(sd, "semantic_enc", wn_layers),
        "spec_enc": _wn_encoder(sd, "spec_enc", wn_layers),
        "dec": _generator(sd, "dec"),
        "flow": _coupling_flow(sd, "flow", n_flows, flow_wn_layers),
        "ref_pre": _conv(sd, "ref_enc.0"),
        "ref_enc": _rvq1_ref_encoder(sd, "ref_enc.1"),
    }
    cb = "quantizer.vq.layers.0._codebook"
    state = RVQState(
        embed=np.asarray(sd[cb + ".embed"])[None].astype(np.float32),
        embed_avg=np.asarray(sd[cb + ".embed_avg"])[None].astype(np.float32),
        cluster_size=np.asarray(sd[cb + ".cluster_size"])[None].astype(np.float32),
        inited=np.asarray(sd[cb + ".inited"]).reshape(()).astype(bool),
    )
    return {"params": params, "codebook": {"quantizer": {"state": state}}}


# ---------------------------------------------------------------------------
# attentions.py stragglers (FFT / TransformerCouplingLayer / depthwise convs)
# → models/attentions_extras.py
# ---------------------------------------------------------------------------


def port_fft_state(state_dict: Dict[str, "np.ndarray"], n_layers: int,
                   isflow: bool = False) -> Dict:
    """attentions.FFT:558-647 → attentions_extras.FFT params."""
    sd = state_dict
    out: Dict = {}
    base = 0
    if isflow:
        out["Conv1d_0"] = _conv(sd, "cond_layer")
        out["cond_pre"] = _conv(sd, "cond_pre")
        base = 1
    for i in range(n_layers):
        out[f"RelPosMultiHeadAttention_{i}"] = _vits_mha(
            sd, f"self_attn_layers.{i}")
        out[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"norm_layers_0.{i}")
        out[f"Conv1d_{base + 2 * i}"] = _conv(sd, f"ffn_layers.{i}.conv_1")
        out[f"Conv1d_{base + 2 * i + 1}"] = _conv(sd, f"ffn_layers.{i}.conv_2")
        out[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"norm_layers_1.{i}")
    return out


def _flow_encoder(sd: Dict, p: str, n_layers: int) -> Dict:
    """attentions.Encoder(isflow=True) → attentions_extras.FlowConditionedEncoder."""
    out: Dict = {
        "Conv1d_0": _conv(sd, p + ".cond_layer"),
        "cond_pre": _conv(sd, p + ".cond_pre"),
    }
    for i in range(n_layers):
        out[f"RelPosMultiHeadAttention_{i}"] = _vits_mha(
            sd, f"{p}.attn_layers.{i}", windowed=True)
        out[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"{p}.norm_layers_1.{i}")
        out[f"ConvFFN_{i}"] = {
            "Conv1d_0": _conv(sd, f"{p}.ffn_layers.{i}.conv_1"),
            "Conv1d_1": _conv(sd, f"{p}.ffn_layers.{i}.conv_2"),
        }
        out[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"{p}.norm_layers_2.{i}")
    return out


def port_transformer_coupling_state(state_dict: Dict[str, "np.ndarray"],
                                    n_layers: int) -> Dict:
    """attentions.TransformerCouplingLayer:648-708 →
    attentions_extras.TransformerCouplingLayer params."""
    sd = state_dict
    return {
        "Conv1d_0": _conv(sd, "pre"),
        "FlowConditionedEncoder_0": _flow_encoder(sd, "enc", n_layers),
        "post": {
            "kernel": _t_conv(np.asarray(sd["post.weight"])),
            "bias": np.asarray(sd["post.bias"]),
        },
    }


def port_depthwise_separable_conv_state(state_dict: Dict[str, "np.ndarray"],
                                        transpose: bool = False) -> Dict:
    """attentions.Depthwise_Separable_{Conv1D,TransposeConv1D}:439-537 →
    attentions_extras params. For the transpose variant the depthwise
    torch weight (C, 1, K) maps onto depth_kernel (K, 1, C)."""
    sd = state_dict
    if not transpose:
        return {
            "Conv1d_0": _conv(sd, "depth_conv"),
            "Conv1d_1": _conv(sd, "point_conv"),
        }
    v, g = _conv_wg(sd, "depth_conv")
    if g is not None:  # fuse torch's per-input-channel WN (dim 0)
        norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
        v = g * v / np.maximum(norm, 1e-12)
    out: Dict = {"depth_kernel": np.transpose(v, (2, 1, 0))}
    if "depth_conv.bias" in sd:
        out["depth_bias"] = np.asarray(sd["depth_conv.bias"])
    out["Conv1d_0"] = _conv(sd, "point_conv")
    return out
