"""Cross-implementation parity on TRAINED reference weights.

test_cross_parity.py ports random-INIT torch state dicts; init-scale
symmetry can mask orientation bugs that cancel at init (VERDICT r2 missing
#3). Here each reference torch model takes real optimizer steps on synthetic
data first — decoupling weight-norm g/v magnitudes, populating EMA codebooks
through the reference's own k-means init + expiry path (core_vq.py:121-165),
and moving every tensor off its init distribution — then the TRAINED state
dict is ported and the same contracts re-asserted: VQ codes bit-identical,
activations ≤1e-3.

Configs are shrunk (channels/depth) where the reference constructor allows it
to bound CPU time; the SynthesizerTrn/RVQ1 posterior/decoder stacks are
hardcoded in the reference, so those train at the released config for a few
composite-objective steps (gradient reaches every module the parity probes
touch: ref_enc → enc_p → proj → quantizer(train) → enc_p_2 → flow⁻¹ → dec).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import refshim

pytestmark = pytest.mark.heavy  # compile-heavy; fast loop = -m "not heavy"

TOL = 1e-3


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestSynthesizerTrnTrained:
    B, T, LTXT = 2, 50, 12

    @pytest.fixture(scope="class")
    def bundle(self):
        vq2 = refshim.import_ref("ttts.vqvae.vq2")
        torch.manual_seed(0)
        model = vq2.SynthesizerTrn(
            spec_channels=1025, segment_size=32, inter_channels=192,
            hidden_channels=192, filter_channels=768, n_heads=2, n_layers=6,
            kernel_size=3, p_dropout=0.1, resblock="1",
            resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            upsample_rates=[10, 8, 2, 2, 2], upsample_initial_channel=512,
            upsample_kernel_sizes=[16, 16, 8, 2, 2], gin_channels=512,
        )
        # NO manual codebook seeding: the first train-mode quantizer call runs
        # the reference's real k-means init (core_vq.py:121-127), later steps
        # run EMA decay + dead-code expiry (:141-168)
        rng = np.random.default_rng(21)
        opt = torch.optim.Adam(model.parameters(), lr=5e-4)
        model.train()
        for step in range(10):
            wav = torch.from_numpy(
                rng.standard_normal((self.B, self.T * 640)).astype(np.float32) * 0.1)
            spec = torch.from_numpy(
                (rng.standard_normal((self.B, 1025, self.T)).astype(np.float32) ** 2) * 0.05)
            text = torch.from_numpy(rng.integers(0, 256, size=(self.B, self.LTXT)))
            y_mask = torch.ones(self.B, 1, self.T)
            ge = model.ref_enc(spec * y_mask, y_mask)
            _, m, logs = model.enc_p(spec, wav.unsqueeze(1), y_mask, g=ge)
            xq = model.proj(m)
            quantized, _, commit, _ = model.quantizer(xq)
            qup = F.interpolate(quantized, size=int(quantized.shape[-1] * 2),
                                mode="nearest")
            _, mp, logsp = model.enc_p_2(
                qup, torch.LongTensor([self.T] * self.B), text,
                torch.LongTensor([self.LTXT] * self.B), ge)
            z = model.flow(mp, y_mask, g=ge, reverse=True)
            o = model.dec(z, g=ge)
            # composite surrogate: gradient reaches every module the parity
            # probe touches; exact objective is irrelevant (we port the
            # resulting state, whatever it is)
            loss = (o.abs().mean() + commit + 0.1 * logsp.pow(2).mean()
                    + 0.1 * logs.pow(2).mean())
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        model.eval()

        from ttts_tpu.config import VQVAEConfig
        from ttts_tpu.models.porting import port_synthesizer_trn_state
        from ttts_tpu.models.vqvae import SynthesizerTrn

        ours = SynthesizerTrn(VQVAEConfig(), spec_channels=1025, segment_frames=32)
        variables = jax.tree_util.tree_map(
            jnp.asarray, port_synthesizer_trn_state(_sd(model)))

        wav = rng.standard_normal((self.B, self.T * 640)).astype(np.float32) * 0.1
        spec = (rng.standard_normal((self.B, 1025, self.T)).astype(np.float32) ** 2) * 0.05
        text = rng.integers(0, 256, size=(self.B, self.LTXT))

        with torch.no_grad():
            y_mask = torch.ones(self.B, 1, self.T)
            tspec, tw = torch.from_numpy(spec), torch.from_numpy(wav)
            ge = model.ref_enc(tspec * y_mask, y_mask)
            _, m_r, logs_r = model.enc_p(tspec, tw.unsqueeze(1), y_mask, g=ge)
            xq_r = model.proj(m_r)
            codes_r = model.quantizer.encode(xq_r)
            qup_r = F.interpolate(model.quantizer.decode(codes_r),
                                  size=int(codes_r.shape[-1] * 2), mode="nearest")
            _, mp_r, logsp_r = model.enc_p_2(
                qup_r, torch.LongTensor([self.T] * self.B),
                torch.from_numpy(text), torch.LongTensor([self.LTXT] * self.B), ge)
            z_r = model.flow(mp_r, y_mask, g=ge, reverse=True)
            o_r = model.dec(z_r, g=ge)

        def probe(v, w, s, lens, t, tl):
            from ttts_tpu.models.blocks import sequence_mask

            mm = ours.bind(v)
            mask = sequence_mask(lens, s.shape[1])
            ge_j = mm.ref_enc(s * mask, mask)
            _, mj, logsj = mm.enc_p(s, w, mask, g=ge_j)
            cj = mm.quantizer.encode(mm.proj(mj))
            qupj = jnp.repeat(mm.quantizer.decode(cj), 2, axis=1)
            _, mpj, logspj = mm.enc_p_2(qupj, mask, t, sequence_mask(tl, t.shape[1]), ge_j)
            zfj = mm.flow(mpj, mask, g=ge_j, reverse=True)
            return ge_j, mj, logsj, cj, mpj, logspj, mm.dec(zfj, g=ge_j)

        out = jax.jit(probe)(
            variables, jnp.asarray(wav)[..., None],
            jnp.asarray(np.transpose(spec, (0, 2, 1))),
            jnp.asarray([self.T] * self.B), jnp.asarray(text),
            jnp.asarray([self.LTXT] * self.B))
        ref = dict(ge=ge, m=m_r, logs=logs_r, codes=codes_r, mp=mp_r,
                   logsp=logsp_r, wav=o_r)
        return model, ref, out

    @staticmethod
    def _tr(a):
        return np.asarray(a).transpose(0, 2, 1)

    def test_codebook_is_off_init(self, bundle):
        model, _, _ = bundle
        cb = model.quantizer.vq.layers[0]._codebook
        assert float(cb.inited) == 1.0
        # EMA cluster sizes populated by real assignments (not the
        # manually-seeded uniform state of the random-init tests)
        assert float(cb.cluster_size.sum()) > 0

    def test_stage_parity(self, bundle):
        _, ref, ours = bundle
        np.testing.assert_allclose(np.asarray(ours[0]),
                                   ref["ge"].squeeze(-1).numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[1]), ref["m"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[2]), ref["logs"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[4]), ref["mp"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[5]), ref["logsp"].numpy(), atol=TOL, rtol=0)
        np.testing.assert_allclose(self._tr(ours[6]), ref["wav"].numpy(), atol=TOL, rtol=0)

    def test_vq_codes_bit_identical_on_trained_codebook(self, bundle):
        _, ref, ours = bundle
        assert (np.asarray(ours[3]) == ref["codes"].numpy()).all()


class TestUnifiedVoiceTrained:
    B, LT, LM, LAYERS, DIM, HEADS = 4, 16, 24, 2, 128, 4

    @pytest.fixture(scope="class")
    def bundle(self):
        gptm = refshim.import_ref("ttts.gpt.model")
        torch.manual_seed(1)
        ref = gptm.UnifiedVoice(
            layers=self.LAYERS, model_dim=self.DIM, heads=self.HEADS,
            max_text_tokens=800, max_mel_tokens=1600, number_text_tokens=256,
            number_mel_codes=1026, start_mel_token=1024, stop_mel_token=1025,
            start_text_token=255, use_mel_codes_as_input=True,
            train_solo_embeddings=False,
        )
        rng = np.random.default_rng(31)
        opt = torch.optim.AdamW(ref.parameters(), lr=1e-3,
                                betas=(0.9, 0.96), weight_decay=0.01)
        ref.train()
        for _ in range(40):  # the reference's own loss (gpt/train.py:109)
            text = torch.from_numpy(rng.integers(1, 256, size=(self.B, self.LT)))
            tl = torch.from_numpy(rng.integers(6, self.LT + 1, size=(self.B,)))
            codes = torch.from_numpy(rng.integers(0, 1024, size=(self.B, self.LM)))
            wl = torch.from_numpy(rng.integers(8, self.LM + 1, size=(self.B,))) * 1024
            lt, lm, _ = ref(text, tl, codes, wl)
            loss = 0.01 * lt + 1.0 * lm
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
            opt.step()
        ref.eval()

        from ttts_tpu.config import GPTConfig
        from ttts_tpu.models.gpt import UnifiedVoice
        from ttts_tpu.models.porting import port_unified_voice_state

        ours = UnifiedVoice(GPTConfig(model_dim=self.DIM, layers=self.LAYERS,
                                      heads=self.HEADS))
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, port_unified_voice_state(_sd(ref), layers=self.LAYERS))}

        text = rng.integers(1, 256, size=(2, self.LT))
        tl = np.asarray([self.LT, self.LT - 5])
        text[1, tl[1]:] = 0
        codes = rng.integers(0, 1024, size=(2, self.LM))
        wl = np.asarray([self.LM, self.LM - 7]) * 1024
        return ref, ours, variables, text, tl, codes, wl

    def test_losses_and_latent_on_trained_weights(self, bundle):
        ref, ours, variables, text, tl, codes, wl = bundle
        with torch.no_grad():
            lt_r, lm_r, _ = ref(torch.from_numpy(text), torch.from_numpy(tl),
                                torch.from_numpy(codes), torch.from_numpy(wl))
            latent_r = ref(torch.from_numpy(text), torch.from_numpy(tl),
                           torch.from_numpy(codes), torch.from_numpy(wl),
                           return_latent=True)
        args = (jnp.asarray(text), jnp.asarray(tl), jnp.asarray(codes),
                jnp.asarray(wl))
        lt_j, lm_j, _ = jax.jit(ours.apply)(variables, *args)
        latent_j = jax.jit(lambda v, *a: ours.apply(v, *a, return_latent=True))(
            variables, *args)
        assert abs(float(lt_j) - float(lt_r)) < TOL
        assert abs(float(lm_j) - float(lm_r)) < TOL
        np.testing.assert_allclose(np.asarray(latent_j), latent_r.numpy(),
                                   atol=TOL, rtol=0)


class TestAADiffusionTrained:
    B, T, TL, TR = 2, 24, 12, 16

    @pytest.fixture(scope="class")
    def bundle(self):
        aa = refshim.import_ref("ttts.diffusion.aa_model")
        torch.manual_seed(2)
        ref = aa.AA_diffusion(model_channels=128, num_layers=2, in_channels=20,
                              in_latent_channels=64, out_channels=40,
                              dropout=0, num_heads=4)
        rng = np.random.default_rng(41)
        opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
        ref.train()
        for step in range(30):
            x = torch.from_numpy(rng.standard_normal((self.B, 20, self.T)).astype(np.float32))
            t = torch.from_numpy(rng.integers(0, 1000, size=(self.B,)))
            latent = torch.from_numpy(
                rng.standard_normal((self.B, 64, self.TL)).astype(np.float32) * 0.3)
            refer = torch.from_numpy(
                rng.standard_normal((self.B, 20, self.TR)).astype(np.float32) * 0.3)
            tgt = torch.from_numpy(rng.standard_normal((self.B, 40, self.T)).astype(np.float32))
            if step % 5 == 4:  # train the unconditioned embedding too
                out = ref(x, t, conditioning_free=True)
            else:
                out = ref(x, t, latent, refer)
            loss = F.mse_loss(out, tgt)
            opt.zero_grad()
            loss.backward()
            opt.step()
        ref.eval()

        from ttts_tpu.config import DiffusionNetConfig
        from ttts_tpu.models.diffusion_net import AA_diffusion
        from ttts_tpu.models.porting import port_aa_diffusion_state

        ours = AA_diffusion(DiffusionNetConfig(
            in_channels=20, out_channels=40, model_channels=128, num_layers=2,
            in_latent_channels=64, num_heads=4))
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, port_aa_diffusion_state(_sd(ref), num_layers=2))}

        x = rng.standard_normal((self.B, 20, self.T)).astype(np.float32)
        t = rng.integers(0, 1000, size=(self.B,))
        latent = rng.standard_normal((self.B, 64, self.TL)).astype(np.float32) * 0.3
        refer = rng.standard_normal((self.B, 20, self.TR)).astype(np.float32) * 0.3
        return ref, ours, variables, x, t, latent, refer

    def test_conditional_on_trained_weights(self, bundle):
        ref, ours, variables, x, t, latent, refer = bundle
        with torch.no_grad():
            out_r = ref(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(latent), torch.from_numpy(refer))
        out_j = jax.jit(ours.apply)(
            variables, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(t),
            jnp.asarray(np.transpose(latent, (0, 2, 1))),
            jnp.asarray(np.transpose(refer, (0, 2, 1))))
        np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                                   out_r.numpy(), atol=TOL, rtol=0)

    def test_cond_free_on_trained_weights(self, bundle):
        ref, ours, variables, x, t, _, _ = bundle
        with torch.no_grad():
            out_r = ref(torch.from_numpy(x), torch.from_numpy(t),
                        conditioning_free=True)
        out_j = jax.jit(lambda v, a, b: ours.apply(v, a, b, conditioning_free=True))(
            variables, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                                   out_r.numpy(), atol=TOL, rtol=0)


class TestCLVPTrained:
    B, LT, LS, DEPTH, DIM = 8, 20, 30, 2, 128

    @pytest.fixture(scope="class")
    def bundle(self):
        clvpm = refshim.import_ref("ttts.clvp.model")
        torch.manual_seed(4)
        ref = clvpm.CLVP(dim_text=self.DIM, dim_speech=self.DIM,
                         dim_latent=self.DIM, text_enc_depth=self.DEPTH,
                         speech_enc_depth=self.DEPTH, text_heads=4,
                         speech_heads=4, use_xformers=False)
        rng = np.random.default_rng(51)
        opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
        ref.train()
        for _ in range(30):  # real symmetric InfoNCE (clvp/model.py:137-139)
            text = torch.from_numpy(rng.integers(0, 256, size=(self.B, self.LT)))
            speech = torch.from_numpy(rng.integers(0, 8192, size=(self.B, self.LS)))
            loss = ref(text, speech, return_loss=True)
            opt.zero_grad()
            loss.backward()
            opt.step()
        ref.eval()

        from ttts_tpu.config import CLVPConfig
        from ttts_tpu.models.clvp import CLVP
        from ttts_tpu.models.porting import port_clvp_state

        ours = CLVP(CLVPConfig(dim_text=self.DIM, dim_speech=self.DIM,
                               dim_latent=self.DIM, text_enc_depth=self.DEPTH,
                               speech_enc_depth=self.DEPTH, text_heads=4,
                               speech_heads=4, use_xformers=False,
                               text_seq_len=120))
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray,
            port_clvp_state(_sd(ref), text_depth=self.DEPTH,
                            speech_depth=self.DEPTH))}
        text = rng.integers(0, 256, size=(3, self.LT))
        speech = rng.integers(0, 8192, size=(3, self.LS))
        return ref, ours, variables, text, speech

    def test_similarity_and_loss_on_trained_weights(self, bundle):
        ref, ours, variables, text, speech = bundle
        with torch.no_grad():
            sim_r = ref(torch.from_numpy(text), torch.from_numpy(speech),
                        return_loss=False).numpy()
            loss_r = float(ref(torch.from_numpy(text), torch.from_numpy(speech),
                               return_loss=True))
        sim_j = np.asarray(jax.jit(ours.apply)(
            variables, jnp.asarray(text), jnp.asarray(speech)))
        loss_j = float(jax.jit(lambda v, a, b: ours.apply(v, a, b, return_loss=True))(
            variables, jnp.asarray(text), jnp.asarray(speech)))
        np.testing.assert_allclose(sim_j, sim_r, atol=TOL, rtol=0)
        assert abs(loss_j - loss_r) < TOL
