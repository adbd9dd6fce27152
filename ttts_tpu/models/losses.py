"""GAN + VAE losses (reference ttts/vqvae/losses.py:7-78)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jax.Array:
    """L1 feature matching ×2 (losses.py:7-15); real features detached."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for fr, fg in zip(dr, dg):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(fr) - fg))
    return loss * 2.0


def discriminator_loss(disc_real, disc_gen):
    """LSGAN discriminator loss (losses.py:18-31)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg**2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_gen):
    """LSGAN generator loss (losses.py:34-43)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_gen:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def mle_loss(z, m, logs, logdet, mask) -> jax.Array:
    """Negative normal log-likelihood for flow training (losses.py:64-78)."""
    import math

    l = jnp.sum(logs) + 0.5 * jnp.sum(jnp.exp(-2 * logs) * ((z - m) ** 2))
    l = l - jnp.sum(logdet)
    l = l / jnp.sum(jnp.ones_like(z) * mask)
    return l + 0.5 * math.log(2 * math.pi)


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jax.Array:
    """Masked VITS KL divergence (losses.py:46-61). All inputs (B, T, C),
    mask (B, T, 1)."""
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)
