"""DiscreteVAE tests (contract: ttts/vqvae/dvae.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.models.dvae import DiscreteVAE


@pytest.fixture(scope="module")
def dvae():
    model = DiscreteVAE(num_tokens=32, codebook_dim=16, channels=8,
                        out_channels=8, hidden_dim=8, num_layers=2)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "vq": jax.random.key(1)}, mel, train=True
    )
    return model, variables, mel


def test_forward_and_codes(dvae):
    model, variables, mel = dvae
    (recon, commit, out), mut = model.apply(
        variables, mel, train=True, rngs={"vq": jax.random.key(2)},
        mutable=["codebook"],
    )
    assert np.isfinite(float(recon)) and np.isfinite(float(commit))
    assert out.shape == (2, 32, 8)  # 2 stride-2 downs then 2 ups

    codes = model.apply(variables, mel, method=model.get_codebook_indices)
    assert codes.shape == (2, 8)  # T / 2^num_layers
    rec = model.apply(variables, codes, method=model.decode_codes)
    assert rec.shape == (2, 32, 8)


def test_training_reduces_recon(dvae):
    model, variables, mel = dvae
    import optax
    from ttts_tpu.train.state import TrainState

    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(3e-3), extra_vars={"codebook": variables["codebook"]},
    )

    @jax.jit
    def step(state, key):
        def loss_fn(params):
            (recon, commit, _), mut = model.apply(
                {"params": params, **state.extra_vars}, mel, train=True,
                rngs={"vq": key}, mutable=["codebook"],
            )
            return recon + commit, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads).replace(extra_vars=dict(mut)), loss

    key = jax.random.key(0)
    _, l0 = step(state, key)
    for i in range(20):
        state, l = step(state, jax.random.fold_in(key, i))
    assert float(l) < float(l0)
