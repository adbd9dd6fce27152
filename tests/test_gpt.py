"""UnifiedVoice tests (contract: ttts/gpt/model.py:292-572)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import GPTConfig
from ttts_tpu.models.gpt import UnifiedVoice, inference_speech
from ttts_tpu.models.sampling import (
    SamplingParams,
    apply_repetition_penalty,
    apply_top_p,
    apply_typical,
)

TINY = GPTConfig(
    model_dim=64,
    layers=2,
    heads=4,
    max_text_tokens=20,
    max_mel_tokens=40,
    number_text_tokens=256,
    number_mel_codes=66,
    start_mel_token=64,
    stop_mel_token=65,
    start_text_token=255,
)

B, LT, LM = 2, 8, 12


@pytest.fixture(scope="module")
def gpt_and_params():
    rng = np.random.default_rng(7)
    model = UnifiedVoice(TINY, mel_length_compression=1024)
    text = jnp.asarray(rng.integers(1, 200, size=(B, LT)))
    text_lengths = jnp.asarray([LT, LT - 3])
    codes = jnp.asarray(rng.integers(0, 64, size=(B, LM)))
    wav_lengths = jnp.asarray([LM * 1024, (LM - 4) * 1024])
    params = model.init(
        jax.random.key(0), text, text_lengths, codes, wav_lengths
    )
    return model, params, (text, text_lengths, codes, wav_lengths)


class TestTraining:
    def test_forward_losses(self, gpt_and_params):
        model, params, (text, tl, codes, wl) = gpt_and_params
        lt, lm, logits = model.apply(params, text, tl, codes, wl)
        assert np.isfinite(float(lt)) and np.isfinite(float(lm))
        assert logits.shape == (B, LM + 2, TINY.number_mel_codes)

    def test_return_latent_shape(self, gpt_and_params):
        model, params, (text, tl, codes, wl) = gpt_and_params
        latent = model.apply(params, text, tl, codes, wl, return_latent=True)
        # latent covers the mel segment minus the 2 trailing tokens (model.py:500)
        assert latent.shape == (B, LM, TINY.model_dim)

    def test_mel_padding_rewrite(self, gpt_and_params):
        model, params, _ = gpt_and_params
        codes = jnp.zeros((1, 10), jnp.int32) + 7
        wav_lengths = jnp.asarray([4 * 1024])
        padded = model.apply(
            params, codes, wav_lengths, method=model._set_mel_padding
        )
        got = np.asarray(padded)[0]
        # positions >= mel_len+1 = 5 become stop tokens
        np.testing.assert_array_equal(got[:5], 7)
        np.testing.assert_array_equal(got[5:], TINY.stop_mel_token)

    def test_grads_finite(self, gpt_and_params):
        model, params, (text, tl, codes, wl) = gpt_and_params

        def loss_fn(p):
            lt, lm, _ = model.apply(p, text, tl, codes, wl)
            return 0.01 * lt + lm

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestIncrementalDecode:
    def test_kv_cache_matches_prefill(self, gpt_and_params):
        """Critical: chained decode_one must reproduce full-prefix logits."""
        model, params, (text, _, codes, _) = gpt_and_params
        full_prompt = codes[:, :6]
        max_len = text.shape[1] + 2 + 6 + 1 + 8

        # ground truth: prefill over the full prompt
        _, logits_full, _, _ = model.apply(
            params, text, full_prompt, max_len, method=model.prefill
        )

        # incremental: prefill over 4 codes, then feed codes 4 and 5
        cache, logits, prefix_len, mel_off = model.apply(
            params, text, codes[:, :4], max_len, method=model.prefill
        )
        for j in range(2):
            logits, cache = model.apply(
                params,
                codes[:, 4 + j],
                cache,
                prefix_len + j,
                mel_off + j,
                max_len,
                method=model.decode_one,
            )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_full), atol=2e-4, rtol=1e-3
        )

    def test_inference_speech_runs_and_stops(self, gpt_and_params):
        model, params, (text, _, codes, _) = gpt_and_params
        out = jax.jit(
            lambda p, t, c, k: inference_speech(
                model, p, t, c, k, max_generate_length=10,
                sampling=SamplingParams(temperature=1.0, top_p=0.95),
            )
        )(params, text, codes[:, :4], jax.random.key(3))
        out = np.asarray(out)
        assert out.shape == (B, 10)
        assert (out >= 0).all() and (out < TINY.number_mel_codes).all()
        # once stopped, stays stopped
        for b in range(B):
            stops = np.where(out[b] == TINY.stop_mel_token)[0]
            if len(stops):
                assert (out[b, stops[0]:] == TINY.stop_mel_token).all()


class TestSampling:
    def test_top_p_keeps_nucleus(self):
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(apply_top_p(logits, 0.7))
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert out[0, 2] == -np.inf and out[0, 3] == -np.inf

    def test_top_p_always_keeps_best(self):
        logits = jnp.asarray([[10.0, 0.0, -5.0]])
        out = np.asarray(apply_top_p(logits, 0.01))
        assert np.isfinite(out[0, 0])
        assert out[0, 1] == -np.inf

    def test_top_p_sortfree_matches_sort(self):
        """The O(V^2) sort-free nucleus mask (vocab <= 2048) must equal the
        sort formulation elementwise, including exact ties and -inf rows."""
        rng = np.random.default_rng(0)
        for trial in range(8):
            lg = rng.standard_normal((4, 1026)).astype(np.float32)
            if trial % 3 == 0:
                lg[:, rng.integers(0, 1026, 40)] = -np.inf
            if trial % 2 == 0:
                lg[:, 100:160] = lg[:, :1]  # exact ties
            small = np.asarray(apply_top_p(jnp.asarray(lg), 0.8))
            # widen past the gate so the sort path runs on the same logits
            wide = np.full((4, 4096), -np.inf, np.float32)
            wide[:, :1026] = lg
            big = np.asarray(apply_top_p(jnp.asarray(wide), 0.8))[:, :1026]
            np.testing.assert_array_equal(small, big)

    def test_repetition_penalty(self):
        logits = jnp.asarray([[2.0, -2.0, 1.0]])
        counts = jnp.asarray([[1, 1, 0]])
        out = np.asarray(apply_repetition_penalty(logits, counts, 2.0))
        np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0])

    def test_typical_keeps_mass(self):
        logits = jnp.log(jnp.asarray([[0.25, 0.25, 0.25, 0.25]]))
        out = np.asarray(apply_typical(logits, 0.9))
        # uniform distribution: all tokens equally typical; ≥1 kept
        assert np.isfinite(out).sum() >= 1


class TestEarlyStopParity:
    def test_while_loop_matches_scan(self, gpt_and_params):
        """Both decode modes share the same rng path — identical tokens up to
        (and padded after) the stop position."""
        model, params, (text, _, codes, _) = gpt_and_params
        kwargs = dict(
            max_generate_length=12,
            sampling=SamplingParams(temperature=1.0, top_p=0.9),
        )
        key = jax.random.key(11)
        a = np.asarray(inference_speech(model, params, text, codes[:, :4], key,
                                        early_stop=False, **kwargs))
        b = np.asarray(inference_speech(model, params, text, codes[:, :4], key,
                                        early_stop=True, **kwargs))
        np.testing.assert_array_equal(a, b)


def test_flash_attention_flag_falls_back_on_cpu():
    """GPTConfig.flash_attention must keep identical numbers on CPU (the
    Pallas route only engages on an accelerator backend)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    batch = dict(
        text=jnp.asarray(rng.integers(1, 100, size=(2, 8))),
        tl=jnp.asarray([8, 6]),
        mel=jnp.asarray(rng.integers(0, 32, size=(2, 12))),
        wl=jnp.asarray([12, 10]) * 1024,
    )
    base = UnifiedVoice(TINY)
    params = base.init(jax.random.key(0), batch["text"], batch["tl"],
                       batch["mel"], batch["wl"])
    fl = UnifiedVoice(dataclasses.replace(TINY, flash_attention=True,
                                          attn_dropout=0.0))
    a = base.apply(params, batch["text"], batch["tl"], batch["mel"],
                   batch["wl"], return_latent=True)
    b = fl.apply(params, batch["text"], batch["tl"], batch["mel"],
                 batch["wl"], return_latent=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpointing_toggle_keeps_param_tree_and_numbers():
    """GPTConfig.checkpointing (nn.remat) must neither rename params nor
    change the forward numbers — a checkpoint written with remat off loads
    with remat on (GPT2Block names are pinned in GPT2Stack)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    batch = dict(
        text=jnp.asarray(rng.integers(1, 100, size=(2, 8))),
        tl=jnp.asarray([8, 6]),
        mel=jnp.asarray(rng.integers(0, 32, size=(2, 12))),
        wl=jnp.asarray([12, 10]) * 1024,
    )
    base = UnifiedVoice(TINY)
    ck = UnifiedVoice(dataclasses.replace(TINY, checkpointing=True))
    p0 = base.init(jax.random.key(0), batch["text"], batch["tl"],
                   batch["mel"], batch["wl"])
    p1 = ck.init(jax.random.key(0), batch["text"], batch["tl"],
                 batch["mel"], batch["wl"])
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    a = base.apply(p0, batch["text"], batch["tl"], batch["mel"], batch["wl"],
                   return_latent=True)
    b = ck.apply(p0, batch["text"], batch["tl"], batch["mel"], batch["wl"],
                 return_latent=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attn_dropout_split_from_resid_dropout():
    """attn_dropout=0 with dropout>0 keeps residual dropout active but makes
    the attention probabilities deterministic (HF attn_pdrop/resid_pdrop
    split)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    batch = dict(
        text=jnp.asarray(rng.integers(1, 100, size=(2, 8))),
        tl=jnp.asarray([8, 6]),
        mel=jnp.asarray(rng.integers(0, 32, size=(2, 12))),
        wl=jnp.asarray([12, 10]) * 1024,
    )
    m = UnifiedVoice(dataclasses.replace(TINY, dropout=0.5, attn_dropout=0.0))
    params = m.init(jax.random.key(0), batch["text"], batch["tl"],
                    batch["mel"], batch["wl"])
    l1, _, _ = m.apply(params, batch["text"], batch["tl"], batch["mel"],
                       batch["wl"], deterministic=False,
                       rngs={"dropout": jax.random.key(1)})
    l2, _, _ = m.apply(params, batch["text"], batch["tl"], batch["mel"],
                       batch["wl"], deterministic=False,
                       rngs={"dropout": jax.random.key(2)})
    # residual dropout still randomizes the loss across dropout keys
    assert float(l1) != float(l2)
