"""TransformerDecoder tests (contract: ttts/vqvae/attentions.py Decoder:91)."""

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.models.blocks import TransformerDecoder, sequence_mask


def test_decoder_causality_and_shapes(rng):
    b, t, th, c = 2, 6, 9, 16
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((b, th, c)).astype(np.float32))
    xm = sequence_mask(jnp.asarray([t, t - 2]), t)
    hm = sequence_mask(jnp.asarray([th, th - 3]), th)
    dec = TransformerDecoder(c, 32, 2, 2)
    params = dec.init(jax.random.key(0), x, xm, h, hm)
    out = dec.apply(params, x, xm, h, hm)
    assert out.shape == (b, t, c)

    # causality: editing a future input must not change earlier outputs
    x2 = x.at[:, -1].add(10.0)
    out2 = dec.apply(params, x2, xm, h, hm)
    np.testing.assert_allclose(np.asarray(out[:, :-1]), np.asarray(out2[:, :-1]),
                               atol=1e-5)
