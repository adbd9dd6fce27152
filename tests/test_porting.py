"""HF GPT-2 weight-porting parity: our GPT2Stack must reproduce HF
GPT2Model's last_hidden_state bit-for-bit-ish on ported weights. This
validates the exact block math needed to port reference UnifiedVoice
checkpoints (ttts/gpt/model.py wraps GPT2Model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ttts_tpu.models.gpt import GPT2Stack, _causal_mask
from ttts_tpu.models.porting import port_hf_gpt2_state


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import GPT2Config, GPT2Model

    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=32, n_positions=64, n_ctx=64, n_embd=64,
                     n_layer=2, n_head=4, use_cache=False,
                     resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = GPT2Model(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = GPT2Stack(layers=2, dim=64, heads=4, dropout=0.0)
    emb0 = jnp.zeros((1, 4, 64))
    params = ours.init(jax.random.key(0), emb0, _causal_mask(4))
    ported = {"params": port_hf_gpt2_state(sd, layers=2)}
    # shapes must line up with a fresh init
    jax.tree_util.tree_map(
        lambda a, b: None if np.shape(a) == np.shape(b) else (_ for _ in ()).throw(
            AssertionError(f"{np.shape(a)} vs {np.shape(b)}")),
        params["params"], ported["params"],
    )
    return hf, ours, ported


def test_hidden_state_parity(hf_and_ours, rng):
    """HF adds wpe(arange) to inputs_embeds; feed our stack the same sum so
    both see identical hidden_states[0]. (Do NOT use position_ids=0 tricks —
    transformers 4.5x builds a degenerate attention mask for constant
    position ids.) The ported reference model needs no wpe handling at all:
    it replaced wpe with zeros (model.py:258-261)."""
    hf, ours, ported = hf_and_ours
    b, t, d = 2, 12, 64
    emb = rng.standard_normal((b, t, d)).astype(np.float32) * 0.05

    with torch.no_grad():
        golden = hf(inputs_embeds=torch.from_numpy(emb)).last_hidden_state
        wpe = hf.wpe(torch.arange(t)[None]).numpy()

    out, _ = ours.apply(ported, jnp.asarray(emb + wpe), _causal_mask(t))
    np.testing.assert_allclose(np.asarray(out), golden.numpy(), atol=2e-5, rtol=1e-4)


def test_hidden_state_parity_single_token(hf_and_ours, rng):
    hf, ours, ported = hf_and_ours
    emb = rng.standard_normal((1, 1, 64)).astype(np.float32) * 0.05
    with torch.no_grad():
        golden = hf(inputs_embeds=torch.from_numpy(emb)).last_hidden_state
        wpe = hf.wpe(torch.arange(1)[None]).numpy()
    out, _ = ours.apply(ported, jnp.asarray(emb + wpe), _causal_mask(1))
    np.testing.assert_allclose(np.asarray(out), golden.numpy(), atol=2e-5, rtol=1e-4)
