"""RVQ1 inference codec tests (contract: ttts/vqvae/rvq1.py:234-373)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.models.rvq1 import RVQ1


@pytest.fixture(scope="module")
def rvq1():
    model = RVQ1(
        spec_channels=65, hubert_channels=64, inter_channels=16, dim=16,
        upsample_initial_channel=32, gin_channels=32, segment_frames=4,
        codebook_bins=32,
    )
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((2, 16, 65)).astype(np.float32))
    hubert = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "slice": jax.random.key(2), "vq": jax.random.key(3)}
    variables = model.init(rngs, spec, hubert, train=True)
    return model, variables, spec, hubert


def test_forward(rvq1):
    model, variables, spec, hubert = rvq1
    rngs = {"noise": jax.random.key(1), "slice": jax.random.key(2),
            "vq": jax.random.key(3)}
    (o, commit, ids, stats, quantized, sem_loss), mut = model.apply(
        variables, spec, hubert, train=True, rngs=rngs, mutable=["codebook"]
    )
    assert o.shape == (2, 4 * 640, 1)
    assert quantized.shape == (2, 16, 64)
    assert np.isfinite(float(commit)) and np.isfinite(float(sem_loss))


def test_extract_code_and_decode(rvq1):
    model, variables, spec, hubert = rvq1
    codes = model.apply(variables, spec, method=model.extract_code)
    assert codes.shape == (2, 1, 8)  # stride-2 semantic rate
    wav = model.apply(variables, jnp.transpose(codes, (1, 0, 2)), spec,
                      method=model.decode, rngs={"noise": jax.random.key(7)})
    assert wav.shape[0] == 2 and np.isfinite(np.asarray(wav)).all()


def test_infer(rvq1):
    model, variables, spec, hubert = rvq1
    wav = model.apply(variables, spec, method=model.infer,
                      rngs={"noise": jax.random.key(9)})
    assert np.isfinite(np.asarray(wav)).all()
