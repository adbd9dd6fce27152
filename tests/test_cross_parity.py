"""Cross-implementation parity against the PyTorch reference itself.

These tests instantiate the reference's own torch modules (random-init —
/root/reference imported under tests/refshim.py shims), port the state dicts
through ttts_tpu.models.porting, and assert the north-star contract:
**VQ codes bit-identical, activations/mel within 1e-3** (BASELINE.md:36-37).

Reference quirk handled here: vq2.PosteriorAudioEncoder *always* samples
z = m + randn·exp(logs), even in eval (vq2.py:746), so the reference's
end-to-end infer/extract path is stochastic by construction. Parity is
therefore asserted stage-wise on the deterministic functions (posterior
mean/logs, quantizer, text prior, flow, decoder), plus bit-identical codes on
a shared quantizer input. Our extract_code uses the posterior mean — the
deterministic choice for artifact production (documented in PARITY.md §2.10).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import refshim

TOL = 1e-3  # the BASELINE.md contract; measured deltas are far smaller


@pytest.fixture(scope="module")
def ref_synth():
    vq2 = refshim.import_ref("ttts.vqvae.vq2")
    torch.manual_seed(0)
    # the reference's released config (ttts/vqvae/config.json `vqvae` block)
    model = vq2.SynthesizerTrn(
        spec_channels=1025, segment_size=32, inter_channels=192,
        hidden_channels=192, filter_channels=768, n_heads=2, n_layers=6,
        kernel_size=3, p_dropout=0.1, resblock="1",
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_rates=[10, 8, 2, 2, 2], upsample_initial_channel=512,
        upsample_kernel_sizes=[16, 16, 8, 2, 2], gin_channels=512,
    )
    model.eval()
    # k-means init leaves the codebook zeroed until the first training batch
    # (core_vq.py:121-127); give it a random uniform state so eval is defined
    cb = model.quantizer.vq.layers[0]._codebook
    with torch.no_grad():
        cb.embed.uniform_(-0.5, 0.5)
        cb.embed_avg.copy_(cb.embed)
        cb.inited.fill_(1.0)
    return model


class TestSynthesizerTrnParity:
    """vq2.SynthesizerTrn:749 vs models/vqvae.py on a ported state dict."""

    B, T, LTXT = 1, 50, 12

    @pytest.fixture(scope="class")
    def bundle(self, ref_synth):
        from ttts_tpu.config import VQVAEConfig
        from ttts_tpu.models.porting import port_synthesizer_trn_state
        from ttts_tpu.models.vqvae import SynthesizerTrn

        sd = {k: v.detach().numpy() for k, v in ref_synth.state_dict().items()}
        ours = SynthesizerTrn(VQVAEConfig(), spec_channels=1025, segment_frames=32)
        variables = jax.tree_util.tree_map(
            jnp.asarray, port_synthesizer_trn_state(sd)
        )

        rng = np.random.default_rng(7)
        wav = rng.standard_normal((self.B, self.T * 640)).astype(np.float32) * 0.1
        spec = (rng.standard_normal((self.B, 1025, self.T)).astype(np.float32) ** 2) * 0.05
        text = rng.integers(0, 256, size=(self.B, self.LTXT))

        with torch.no_grad():
            y_mask = torch.ones(self.B, 1, self.T)
            tspec, tw = torch.from_numpy(spec), torch.from_numpy(wav)
            ge = ref_synth.ref_enc(tspec * y_mask, y_mask)
            _, m_r, logs_r = ref_synth.enc_p(tspec, tw.unsqueeze(1), y_mask, g=ge)
            xq_r = ref_synth.proj(m_r)
            codes_r = ref_synth.quantizer.encode(xq_r)
            qdec_r = ref_synth.quantizer.decode(codes_r)
            qup_r = torch.nn.functional.interpolate(
                qdec_r, size=int(qdec_r.shape[-1] * 2), mode="nearest"
            )
            _, mp_r, logsp_r = ref_synth.enc_p_2(
                qup_r, torch.LongTensor([self.T] * self.B),
                torch.from_numpy(text), torch.LongTensor([self.LTXT] * self.B), ge,
            )
            z_flow_r = ref_synth.flow(mp_r, y_mask, g=ge, reverse=True)
            o_r = ref_synth.dec(z_flow_r, g=ge)

        def probe(v, w, s, lens, t, tl):
            from ttts_tpu.models.blocks import sequence_mask

            m = ours.bind(v)
            mask = sequence_mask(lens, s.shape[1])
            ge_j = m.ref_enc(s * mask, mask)
            _, mj, logsj = m.enc_p(s, w, mask, g=ge_j)
            xpj = m.proj(mj)
            cj = m.quantizer.encode(xpj)
            qupj = jnp.repeat(m.quantizer.decode(cj), 2, axis=1)
            _, mpj, logspj = m.enc_p_2(qupj, mask, t, sequence_mask(tl, t.shape[1]), ge_j)
            zfj = m.flow(mpj, mask, g=ge_j, reverse=True)
            return ge_j, mj, logsj, cj, mpj, logspj, m.dec(zfj, g=ge_j)

        out = jax.jit(probe)(
            variables,
            jnp.asarray(wav)[..., None],
            jnp.asarray(np.transpose(spec, (0, 2, 1))),
            jnp.asarray([self.T] * self.B),
            jnp.asarray(text),
            jnp.asarray([self.LTXT] * self.B),
        )
        torch_out = dict(ge=ge, m=m_r, logs=logs_r, codes=codes_r, mp=mp_r,
                         logsp=logsp_r, wav=o_r, xq=xq_r)
        return ref_synth, ours, variables, torch_out, out

    @staticmethod
    def _tr(a):  # ours (B, T, C) → torch (B, C, T)
        return np.asarray(a).transpose(0, 2, 1)

    def test_style_encoder(self, bundle):
        _, _, _, ref, ours = bundle
        np.testing.assert_allclose(np.asarray(ours[0]), ref["ge"].squeeze(-1).numpy(),
                                   atol=TOL, rtol=0)

    def test_posterior_mean_logs(self, bundle):
        _, _, _, ref, ours = bundle
        np.testing.assert_allclose(self._tr(ours[1]), ref["m"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[2]), ref["logs"].numpy(), atol=TOL, rtol=0)

    def test_vq_codes_bit_identical(self, bundle):
        _, _, _, ref, ours = bundle
        assert (np.asarray(ours[3]) == ref["codes"].numpy()).all()

    def test_vq_codes_identical_on_diverse_input(self, bundle):
        """Shared random quantizer input (diverse codes) → identical indices."""
        ref_model, ours_model, variables, _, _ = bundle
        rng = np.random.default_rng(11)
        xq = rng.standard_normal((2, 192, 40)).astype(np.float32) * 0.3
        with torch.no_grad():
            codes_r = ref_model.quantizer.encode(torch.from_numpy(xq)).numpy()
        codes_j = np.asarray(
            ours_model.apply(
                variables, jnp.asarray(np.transpose(xq, (0, 2, 1))),
                method=lambda m, x: m.quantizer.encode(x),
            )
        )
        assert len(np.unique(codes_r)) > 10, "degenerate test input"
        assert (codes_j == codes_r).all()

    def test_text_prior(self, bundle):
        _, _, _, ref, ours = bundle
        np.testing.assert_allclose(self._tr(ours[4]), ref["mp"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[5]), ref["logsp"].numpy(), atol=TOL, rtol=0)

    def test_flow_and_decoder_wav(self, bundle):
        _, _, _, ref, ours = bundle
        np.testing.assert_allclose(self._tr(ours[6]), ref["wav"].numpy(), atol=TOL, rtol=0)


class TestUnifiedVoiceParity:
    """ttts/gpt/model.py:292 UnifiedVoice vs models/gpt.py on ported weights,
    at the released v2 config (ttts/gpt/config.json `gpt` block)."""

    B, LT, LM = 2, 24, 40

    @pytest.fixture(scope="class")
    def bundle(self):
        gptm = refshim.import_ref("ttts.gpt.model")
        torch.manual_seed(1)
        ref = gptm.UnifiedVoice(
            layers=6, model_dim=512, heads=8, max_text_tokens=800,
            max_mel_tokens=1600, number_text_tokens=256, number_mel_codes=1026,
            start_mel_token=1024, stop_mel_token=1025, start_text_token=255,
            use_mel_codes_as_input=True, train_solo_embeddings=False,
        ).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from ttts_tpu.config import GPTConfig
        from ttts_tpu.models.gpt import UnifiedVoice
        from ttts_tpu.models.porting import port_unified_voice_state

        ours = UnifiedVoice(GPTConfig())
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, port_unified_voice_state(sd, layers=6))}

        rng = np.random.default_rng(3)
        text = rng.integers(1, 256, size=(self.B, self.LT))
        text_lengths = np.asarray([self.LT, self.LT - 7])
        text[1, text_lengths[1]:] = 0  # dataset pads with 0 == stop_text_token
        codes = rng.integers(0, 1024, size=(self.B, self.LM))
        wav_lengths = np.asarray([self.LM, self.LM - 11]) * 1024
        return ref, ours, variables, text, text_lengths, codes, wav_lengths

    def test_losses_logits_latent(self, bundle):
        ref, ours, variables, text, text_lengths, codes, wav_lengths = bundle
        with torch.no_grad():
            lt_r, lm_r, logits_r = ref(
                torch.from_numpy(text), torch.from_numpy(text_lengths),
                torch.from_numpy(codes), torch.from_numpy(wav_lengths),
            )
            latent_r = ref(
                torch.from_numpy(text), torch.from_numpy(text_lengths),
                torch.from_numpy(codes), torch.from_numpy(wav_lengths),
                return_latent=True,
            )
        args = (jnp.asarray(text), jnp.asarray(text_lengths), jnp.asarray(codes),
                jnp.asarray(wav_lengths))
        lt_j, lm_j, logits_j = jax.jit(ours.apply)(variables, *args)
        latent_j = jax.jit(lambda v, *a: ours.apply(v, *a, return_latent=True))(
            variables, *args)
        assert abs(float(lt_j) - float(lt_r)) < TOL
        assert abs(float(lm_j) - float(lm_r)) < TOL
        np.testing.assert_allclose(
            np.asarray(logits_j).transpose(0, 2, 1), logits_r.numpy(),
            atol=5e-3, rtol=0)  # pre-softmax logits; CE above is the contract
        np.testing.assert_allclose(np.asarray(latent_j), latent_r.numpy(),
                                   atol=TOL, rtol=0)


class TestAADiffusionParity:
    """ttts/diffusion/aa_model.py:182 AA_diffusion vs models/diffusion_net.py
    at the released config (ttts/diffusion/config.yaml `aa_diffusion`)."""

    B, T, TL, TR = 2, 36, 18, 24

    @pytest.fixture(scope="class")
    def bundle(self):
        aa = refshim.import_ref("ttts.diffusion.aa_model")
        torch.manual_seed(2)
        ref = aa.AA_diffusion(
            model_channels=512, num_layers=6, in_channels=100,
            in_latent_channels=512, out_channels=200, dropout=0, num_heads=16,
        ).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from ttts_tpu.config import DiffusionNetConfig
        from ttts_tpu.models.diffusion_net import AA_diffusion
        from ttts_tpu.models.porting import port_aa_diffusion_state

        ours = AA_diffusion(DiffusionNetConfig())
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, port_aa_diffusion_state(sd, num_layers=6))}

        rng = np.random.default_rng(5)
        x = rng.standard_normal((self.B, 100, self.T)).astype(np.float32)
        t = rng.integers(0, 1000, size=(self.B,))
        latent = rng.standard_normal((self.B, 512, self.TL)).astype(np.float32) * 0.3
        refer = rng.standard_normal((self.B, 100, self.TR)).astype(np.float32) * 0.3
        return ref, ours, variables, x, t, latent, refer

    def test_conditional_forward(self, bundle):
        ref, ours, variables, x, t, latent, refer = bundle
        with torch.no_grad():
            out_r = ref(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(latent), torch.from_numpy(refer))
        out_j = jax.jit(ours.apply)(
            variables, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(t),
            jnp.asarray(np.transpose(latent, (0, 2, 1))),
            jnp.asarray(np.transpose(refer, (0, 2, 1))),
        )
        np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                                   out_r.numpy(), atol=TOL, rtol=0)

    def test_conditioning_free_forward(self, bundle):
        ref, ours, variables, x, t, _, _ = bundle
        with torch.no_grad():
            out_r = ref(torch.from_numpy(x), torch.from_numpy(t),
                        conditioning_free=True)
        out_j = jax.jit(lambda v, a, b: ours.apply(v, a, b, conditioning_free=True))(
            variables, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                                   out_r.numpy(), atol=TOL, rtol=0)


class TestCLVPParity:
    """ttts/clvp/model.py:19 CLVP (the use_xformers=False variant the v2
    trainer builds) vs models/clvp.py PlainEncoder on ported weights. Depth
    shrunk 20→4 to bound CPU compile; layer math is identical per depth."""

    B, LT, LS, DEPTH = 3, 30, 44, 4

    @pytest.fixture(scope="class")
    def bundle(self):
        clvpm = refshim.import_ref("ttts.clvp.model")
        torch.manual_seed(4)
        ref = clvpm.CLVP(
            dim_text=768, dim_speech=768, dim_latent=768,
            text_enc_depth=self.DEPTH, speech_enc_depth=self.DEPTH,
            text_heads=16, speech_heads=16, use_xformers=False,
        ).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from ttts_tpu.config import CLVPConfig
        from ttts_tpu.models.clvp import CLVP
        from ttts_tpu.models.porting import port_clvp_state

        cfg = CLVPConfig(text_enc_depth=self.DEPTH, speech_enc_depth=self.DEPTH,
                         use_xformers=False, text_seq_len=120)
        ours = CLVP(cfg)
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray,
            port_clvp_state(sd, text_depth=self.DEPTH, speech_depth=self.DEPTH))}

        rng = np.random.default_rng(9)
        text = rng.integers(0, 256, size=(self.B, self.LT))
        speech = rng.integers(0, 8192, size=(self.B, self.LS))
        return ref, ours, variables, text, speech

    def test_similarity_and_loss(self, bundle):
        ref, ours, variables, text, speech = bundle
        with torch.no_grad():
            sim_r = ref(torch.from_numpy(text), torch.from_numpy(speech),
                        return_loss=False).numpy()
            loss_r = float(ref(torch.from_numpy(text), torch.from_numpy(speech),
                               return_loss=True))
        sim_j = np.asarray(jax.jit(ours.apply)(
            variables, jnp.asarray(text), jnp.asarray(speech)))
        loss_j = float(jax.jit(
            lambda v, a, b: ours.apply(v, a, b, return_loss=True)
        )(variables, jnp.asarray(text), jnp.asarray(speech)))
        np.testing.assert_allclose(sim_j, sim_r, atol=TOL, rtol=0)
        assert abs(loss_j - loss_r) < TOL


class TestCLVPXformersParity:
    """ttts/clvp/model.py:19 CLVP with use_xformers=True (the api.py:208
    serving configuration: x-transformers Encoder — RMSNorm, GLU-FF mult 2,
    rotary over the first 32 head dims of q/k/v, dim_head 64, final wrapper
    LayerNorm) vs models/clvp.py CLVPEncoder on ported weights. Depth 20→3
    to bound CPU compile; layer math is identical per depth."""

    B, LT, LS, DEPTH = 3, 30, 44, 3

    @pytest.fixture(scope="class")
    def bundle(self):
        clvpm = refshim.import_ref("ttts.clvp.model")
        torch.manual_seed(11)
        ref = clvpm.CLVP(
            dim_text=768, dim_speech=768, dim_latent=768,
            text_enc_depth=self.DEPTH, speech_enc_depth=self.DEPTH,
            text_heads=16, speech_heads=16, use_xformers=True,
        ).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from ttts_tpu.config import CLVPConfig
        from ttts_tpu.models.clvp import CLVP
        from ttts_tpu.models.porting import port_clvp_xformers_state

        cfg = CLVPConfig(text_enc_depth=self.DEPTH, speech_enc_depth=self.DEPTH,
                         use_xformers=True)
        ours = CLVP(cfg)
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray,
            port_clvp_xformers_state(sd, text_depth=self.DEPTH,
                                     speech_depth=self.DEPTH))}

        rng = np.random.default_rng(13)
        text = rng.integers(0, 256, size=(self.B, self.LT))
        speech = rng.integers(0, 8192, size=(self.B, self.LS))
        return ref, ours, variables, text, speech

    def test_similarity_and_loss(self, bundle):
        ref, ours, variables, text, speech = bundle
        with torch.no_grad():
            sim_r = ref(torch.from_numpy(text), torch.from_numpy(speech),
                        return_loss=False).numpy()
            loss_r = float(ref(torch.from_numpy(text), torch.from_numpy(speech),
                               return_loss=True))
        sim_j = np.asarray(jax.jit(ours.apply)(
            variables, jnp.asarray(text), jnp.asarray(speech)))
        loss_j = float(jax.jit(
            lambda v, a, b: ours.apply(v, a, b, return_loss=True)
        )(variables, jnp.asarray(text), jnp.asarray(speech)))
        np.testing.assert_allclose(sim_j, sim_r, atol=TOL, rtol=0)
        assert abs(loss_j - loss_r) < TOL

    def test_partial_masks(self, bundle):
        """Ragged masks route through the q×k pair mask — rank the same pairs
        the torch model would under its all-ones eval mask on the valid
        prefix (exercised by trimming vs masking)."""
        ref, ours, variables, text, speech = bundle
        lt, ls = self.LT - 7, self.LS - 11
        with torch.no_grad():
            sim_r = ref(torch.from_numpy(text[:, :lt]),
                        torch.from_numpy(speech[:, :ls]),
                        return_loss=False).numpy()
        tmask = np.zeros_like(text, bool)
        tmask[:, :lt] = True
        vmask = np.zeros_like(speech, bool)
        vmask[:, :ls] = True
        sim_j = np.asarray(jax.jit(ours.apply)(
            variables, jnp.asarray(text), jnp.asarray(speech),
            jnp.asarray(tmask), jnp.asarray(vmask)))
        np.testing.assert_allclose(sim_j, sim_r, atol=TOL, rtol=0)


class TestRVQ1Parity:
    """ttts/vqvae/rvq1.py:234 RVQ1 vs models/rvq1.py on ported weights.

    The reference's own end-to-end methods are bit-rotted (SemanticEncoder
    and the rvq1 flow call WN/coupling layers without the x_mask argument →
    TypeError; decode unpacks 4 values from a 3-tuple). Parity is asserted by
    driving the reference SUBMODULES with the intended all-ones masks."""

    B, T = 1, 50

    @pytest.fixture(scope="class")
    def bundle(self):
        rvq1m = refshim.import_ref("ttts.vqvae.rvq1")
        torch.manual_seed(6)
        ref = rvq1m.RVQ1(
            spec_channels=1025, hubert_channels=1024, inter_channels=192,
            dim=192, resblock="1", resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            upsample_rates=[10, 8, 2, 2, 2], upsample_initial_channel=512,
            upsample_kernel_sizes=[16, 16, 8, 2, 2], gin_channels=512,
            segment_size=32,
        ).eval()
        cb = ref.quantizer.vq.layers[0]._codebook
        with torch.no_grad():
            cb.embed.uniform_(-0.5, 0.5)
            cb.embed_avg.copy_(cb.embed)
            cb.inited.fill_(1.0)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from ttts_tpu.models.porting import port_rvq1_state
        from ttts_tpu.models.rvq1 import RVQ1

        ours = RVQ1()
        variables = jax.tree_util.tree_map(jnp.asarray, port_rvq1_state(sd))

        rng = np.random.default_rng(13)
        spec = (rng.standard_normal((self.B, 1025, self.T)).astype(np.float32) ** 2) * 0.05

        with torch.no_grad():
            tspec = torch.from_numpy(spec)
            mask = torch.ones(self.B, 1, self.T)
            ge = ref.ref_enc(tspec).unsqueeze(-1)
            # SemanticEncoder path with the intended all-ones mask
            h = ref.semantic_enc.in_proj(tspec)
            h = ref.semantic_enc.enc(h, mask, g=ge)
            semantic = ref.semantic_enc.proj(h)
            sem_down = ref.semantic_proj(semantic)
            codes = ref.quantizer.encode(sem_down)
            qdec = ref.quantizer.decode(codes)
            qup = torch.nn.functional.interpolate(
                qdec, size=int(qdec.shape[-1] * 2), mode="nearest")
            _, mp, logsp = ref.text_enc(qup, ge)
            z = mp
            for flow in reversed(ref.flow.flows):
                if hasattr(flow, "pre"):  # coupling layer (needs mask)
                    z = flow(z, mask, g=ge, reverse=True)
                else:  # Flip
                    z = flow(z, reverse=True)
            o = ref.dec(z, g=ge)

        def probe(v, s):
            m = ours.bind(v)
            ge_j = m._ge(s)
            sem_j = m.semantic_enc(s, g=ge_j)
            down_j = m.semantic_proj(sem_j)
            cj = m.quantizer.encode(down_j)
            qup_j = jnp.repeat(m.quantizer.decode(cj), 2, axis=1)
            _, mpj, logspj = m.text_enc(qup_j, ge_j)
            ones = jnp.ones(mpj.shape[:2] + (1,))
            zj = m.flow(mpj, ones, g=ge_j, reverse=True)
            return ge_j, sem_j, cj, mpj, logspj, m.dec(zj, g=ge_j)

        out = jax.jit(probe)(variables, jnp.asarray(np.transpose(spec, (0, 2, 1))))
        torch_out = dict(ge=ge, semantic=semantic, codes=codes, mp=mp,
                         logsp=logsp, wav=o)
        return torch_out, out

    @staticmethod
    def _tr(a):
        return np.asarray(a).transpose(0, 2, 1)

    def test_ref_encoder(self, bundle):
        ref, ours = bundle
        np.testing.assert_allclose(np.asarray(ours[0]),
                                   ref["ge"].squeeze(-1).numpy(), atol=TOL, rtol=0)

    def test_semantic_encoder(self, bundle):
        ref, ours = bundle
        np.testing.assert_allclose(self._tr(ours[1]), ref["semantic"].numpy(),
                                   atol=TOL, rtol=0)

    def test_vq_codes_bit_identical(self, bundle):
        ref, ours = bundle
        assert (np.asarray(ours[2]) == ref["codes"].numpy()).all()

    def test_text_prior(self, bundle):
        ref, ours = bundle
        np.testing.assert_allclose(self._tr(ours[3]), ref["mp"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[4]), ref["logsp"].numpy(), atol=TOL, rtol=0)

    def test_flow_and_decoder_wav(self, bundle):
        ref, ours = bundle
        np.testing.assert_allclose(self._tr(ours[5]), ref["wav"].numpy(), atol=TOL, rtol=0)
