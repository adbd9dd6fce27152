"""Group vector quantizer — the codec's unused-but-shipped alternative VQ
(reference ttts/vqvae/vq2.py Quantizer:571-616 + Quantizer_module:554-569).

Splits the embedding into n_code_groups groups, each with its own learned
codebook trained by gradient (VQ-VAE commitment + codebook loss, weights
0.25/1.0) rather than EMA. Channels-last: x (B, T, C).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GroupQuantizer(nn.Module):
    embed_dim: int = 512
    n_code_groups: int = 4
    n_codes: int = 160

    def setup(self):
        assert self.embed_dim % self.n_code_groups == 0
        d = self.embed_dim // self.n_code_groups
        init = nn.initializers.uniform(scale=2.0 / self.n_codes)
        # uniform(-1/n, 1/n) like the reference's embedding init
        self.codebooks = self.param(
            "codebooks",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_codes, maxval=1.0 / self.n_codes
            ),
            (self.n_code_groups, self.n_codes, d),
        )

    def _group_nearest(self, xg: jax.Array, cb: jax.Array):
        """xg (N, d), cb (codes, d) → (quantized (N, d), idx (N,))."""
        dist = (
            jnp.sum(xg**2, 1, keepdims=True)
            - 2.0 * jnp.dot(xg, cb.T, precision="float32")
            + jnp.sum(cb**2, 1)[None, :]
        )
        idx = jnp.argmin(dist, axis=1)
        return cb[idx], idx

    def __call__(self, x: jax.Array):
        """x (B, T, C) → (quantized straight-through, loss, codes (B, G, T))."""
        b, t, c = x.shape
        g = self.n_code_groups
        d = c // g
        flat = x.reshape(-1, g, d)
        zq, codes = [], []
        for i in range(g):
            q, idx = self._group_nearest(flat[:, i], self.codebooks[i])
            zq.append(q)
            codes.append(idx)
        zq = jnp.stack(zq, axis=1).reshape(b, t, c)
        loss = 0.25 * jnp.mean((jax.lax.stop_gradient(zq) - x) ** 2) + jnp.mean(
            (zq - jax.lax.stop_gradient(x)) ** 2
        )
        zq_st = x + jax.lax.stop_gradient(zq - x)
        codes = jnp.stack(codes, axis=0).reshape(g, b, t).transpose(1, 0, 2)
        return zq_st, loss, codes

    def embed(self, codes: jax.Array) -> jax.Array:
        """codes (B, G, T) → (B, T, C) (vq2.py Quantizer.embed:606-616)."""
        b, g, t = codes.shape
        outs = [self.codebooks[i][codes[:, i]] for i in range(g)]
        return jnp.concatenate(outs, axis=-1)
