"""Residual vector quantization with EMA codebooks — pure-functional JAX.

Behavioral contract (reference, for parity checking):
  - EuclideanCodebook: ttts/vqvae/core_vq.py:96-230 — EMA decay 0.99,
    laplace smoothing eps 1e-5, k-means init on the first training batch
    (kmeans: core_vq.py:71-93, 500-sample cap), dead-code expiry below an EMA
    cluster-size threshold of 2, straight-through estimator with commitment
    loss weight 1.0 (VectorQuantization.forward: core_vq.py:303-322).
  - ResidualVectorQuantization: core_vq.py:325-383 — residual stack.
  - ResidualVectorQuantizer wrapper: ttts/vqvae/quantize.py:28-119.

TPU-native design: the codebook is explicit state threaded through the train
step (no mutable buffers), so everything jits. The nearest-neighbour search is
‖x‖² − 2xWᵀ + ‖W‖² followed by an argmax — one MXU matmul at (N, dim)×(dim,
bins). Two deliberate fixes over the reference:
  1. Cross-replica codebook-stat reduction. The reference disabled its
     broadcast sync (core_vq.py:150,168), a latent multi-GPU divergence bug;
     here the EMA statistics are computed with global semantics (under pjit
     XLA inserts the collective; under shard_map pass ``axis_name``).
  2. Dead-code expiry also resets ``embed_avg``/``cluster_size`` so the
     replacement survives the same-step EMA normalization (in the reference
     the replaced rows are immediately overwritten by embed_avg/cluster).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RVQState:
    """EMA codebook state for all residual quantizer layers.

    embed:        (n_q, bins, dim) current codebook
    embed_avg:    (n_q, bins, dim) EMA numerator
    cluster_size: (n_q, bins)      EMA code usage
    inited:       ()               bool; False until k-means init on 1st batch
    """

    embed: jax.Array
    embed_avg: jax.Array
    cluster_size: jax.Array
    inited: jax.Array


def rvq_state_from_dict(tree):
    """Rebuild RVQState structs inside a restored variables tree.

    Orbax `restore()` without a template (infer_utils.load_model,
    pipeline cmd_vq) returns plain nested dicts; any dict whose keys are
    exactly the RVQState fields is rehydrated into the struct so
    `quantizer.encode/decode` work on restored checkpoints."""
    import jax.numpy as jnp

    fields = {"embed", "embed_avg", "cluster_size", "inited"}

    def walk(node):
        if isinstance(node, dict):
            if set(node.keys()) == fields:
                return RVQState(**{k: jnp.asarray(v) for k, v in node.items()})
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(tree)


def rvq_init(
    key: jax.Array, n_q: int, bins: int, dim: int, kmeans_init: bool = True
) -> RVQState:
    if kmeans_init:
        embed = jnp.zeros((n_q, bins, dim), jnp.float32)
    else:
        # kaiming-uniform, matching uniform_init (core_vq.py:54-57)
        bound = jnp.sqrt(1.0 / dim) * jnp.sqrt(3.0)
        embed = jax.random.uniform(key, (n_q, bins, dim), jnp.float32, -bound, bound)
    return RVQState(
        embed=embed,
        embed_avg=embed,
        cluster_size=jnp.zeros((n_q, bins), jnp.float32),
        inited=jnp.asarray(not kmeans_init),
    )


def _sample_vectors(key: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """Pick ``num`` rows from ``samples`` (with replacement when short) —
    semantics of sample_vectors (core_vq.py:60-68)."""
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(key, n)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, n)
    return samples[idx]


def _kmeans(key: jax.Array, samples: jax.Array, num_clusters: int,
            num_iters: int = 10, seeding: str = "farthest_point"):
    """k-means with a 500-sample cap (core_vq.py:71-93). Static shapes.

    Default seeding is farthest-point (kmeans++-style) rather than the
    reference's uniform sample (core_vq.py:76), which collapses clusters on
    well-separated data; pass seeding="uniform" for the reference's exact
    training dynamics. Lloyd iterations and the empty-cluster rule match the
    reference either way.
    """
    samples = samples[:500]
    n = samples.shape[0]
    if seeding == "uniform":
        # sample_vectors semantics (core_vq.py:60-68, 76)
        means = _sample_vectors(key, samples, num_clusters)
    elif seeding == "farthest_point":
        first = jax.random.randint(key, (), 0, n)
        means0 = jnp.zeros((num_clusters, samples.shape[-1]), samples.dtype)
        means0 = means0.at[0].set(samples[first])
        mind0 = jnp.sum((samples - means0[0]) ** 2, -1)

        def seed_step(i, carry):
            means, mind = carry
            idx = jnp.argmax(mind)
            means = means.at[i].set(samples[idx])
            mind = jnp.minimum(mind, jnp.sum((samples - means[i]) ** 2, -1))
            return means, mind

        means, _ = jax.lax.fori_loop(1, num_clusters, seed_step, (means0, mind0))
    else:
        raise NotImplementedError(f"unknown k-means seeding {seeding!r}")

    def step(_, means):
        dists = (
            jnp.sum(samples**2, -1, keepdims=True)
            - 2.0 * jnp.dot(samples, means.T, precision="float32")
            + jnp.sum(means**2, -1)[None, :]
        )
        buckets = jnp.argmin(dists, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = onehot.sum(0)
        new_means = (onehot.T @ samples) / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, step, means)
    # final assignment counts (init value for cluster_size)
    dists = (
        jnp.sum(samples**2, -1, keepdims=True)
        - 2.0 * jnp.dot(samples, means.T, precision="float32")
        + jnp.sum(means**2, -1)[None, :]
    )
    counts = jax.nn.one_hot(jnp.argmin(dists, -1), num_clusters, dtype=jnp.float32).sum(0)
    return means, counts


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _nearest(x: jax.Array, embed: jax.Array) -> jax.Array:
    """argmin_j ‖x_i − e_j‖² → (N,) indices. x: (N, D), embed: (bins, D).

    On TPU with a large enough problem this routes to the fused Pallas kernel
    (ttts_tpu/ops/pallas/vq.py) that never spills the distance matrix to HBM;
    otherwise one MXU matmul with fused norm epilogues."""
    n, _ = x.shape
    bins = embed.shape[0]
    if _on_tpu() and n * bins >= (1 << 16):
        from ttts_tpu.ops.pallas.vq import vq_nearest_pallas

        # indices are integral (zero tangent), but pallas_call has no JVP
        # rule — without the stop_gradient this crashes when the k-means
        # init runs inside a value_and_grad trace (the GAN train step)
        x, embed = jax.lax.stop_gradient((x, embed))
        return vq_nearest_pallas(x, embed).astype(jnp.int32)
    dist = (
        jnp.sum(x**2, axis=1, keepdims=True)
        - 2.0 * jnp.dot(x, embed.T, preferred_element_type=jnp.float32,
                precision="float32")
        + jnp.sum(embed**2, axis=1)[None, :]
    )
    return jnp.argmin(dist, axis=-1)


def _psum_if(axis_name: Optional[str], x: jax.Array) -> jax.Array:
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _global_pool(axis_name: Optional[str], x: jax.Array) -> jax.Array:
    """Candidate pool for expiry replacement / k-means init.

    Under shard_map (axis_name set) every replica must draw replacements from
    the SAME pool with the SAME key, or codebooks silently diverge — the
    multi-replica bug the reference left disabled (core_vq.py:150,168). Under
    pjit (no axis_name) x already has global semantics."""
    if axis_name is None:
        return x
    g = jax.lax.all_gather(x, axis_name)  # (replicas, N, D)
    return g.reshape(-1, x.shape[-1])


def _layer_update(
    state_i: Tuple[jax.Array, jax.Array, jax.Array],
    x: jax.Array,
    onehot: jax.Array,
    key: jax.Array,
    decay: float,
    epsilon: float,
    threshold: float,
    axis_name: Optional[str],
):
    """EMA update + dead-code expiry for one quantizer layer.

    x: (N, D) inputs, onehot: (N, bins). Mirrors core_vq.py:216-228 with the
    expiry/sync fixes described in the module docstring.
    """
    embed, embed_avg, cluster_size = state_i
    bins = embed.shape[0]

    onehot_sum = _psum_if(axis_name, onehot.sum(0))  # (bins,)
    embed_sum = _psum_if(axis_name, onehot.T @ x)  # (bins, D)

    cluster_size = decay * cluster_size + (1 - decay) * onehot_sum
    embed_avg = decay * embed_avg + (1 - decay) * embed_sum

    # dead-code expiry (threshold 2, core_vq.py:158-168) — also reset avg/size
    expired = cluster_size < threshold
    replacement = _sample_vectors(key, _global_pool(axis_name, x), bins)
    embed_avg = jnp.where(expired[:, None], replacement, embed_avg)
    cluster_size = jnp.where(expired, jnp.ones_like(cluster_size), cluster_size)

    n = cluster_size.sum()
    smoothed = (cluster_size + epsilon) / (n + bins * epsilon) * n
    embed = embed_avg / smoothed[:, None]
    return embed, embed_avg, cluster_size


def rvq_encode(state: RVQState, x: jax.Array, n_q: Optional[int] = None) -> jax.Array:
    """x: (B, T, D) → codes (n_q, B, T). quantize.py:96-110 semantics."""
    n_q = n_q or state.embed.shape[0]
    b, t, d = x.shape
    residual = x.reshape(-1, d)
    codes = []
    for i in range(n_q):
        idx = _nearest(residual, state.embed[i])
        codes.append(idx.reshape(b, t))
        residual = residual - state.embed[i][idx]
    return jnp.stack(codes)


def rvq_decode(state: RVQState, codes: jax.Array) -> jax.Array:
    """codes: (n_q, B, T) → (B, T, D). quantize.py:112-119 semantics."""
    out = jnp.zeros(codes.shape[1:] + (state.embed.shape[-1],), state.embed.dtype)
    for i in range(codes.shape[0]):
        out = out + state.embed[i][codes[i]]
    return out


def rvq_forward(
    state: RVQState,
    x: jax.Array,
    key: jax.Array,
    train: bool,
    n_q: Optional[int] = None,
    decay: float = 0.99,
    epsilon: float = 1e-5,
    threshold_ema_dead_code: float = 2.0,
    axis_name: Optional[str] = None,
    kmeans_seeding: str = "farthest_point",
):
    """Full RVQ training/eval forward.

    x: (B, T, D). Returns (quantized (B,T,D), codes (n_q,B,T), commit_loss
    scalar, new_state). Mirrors ResidualVectorQuantizer.forward
    (quantize.py:70-95): straight-through, commit weight 1.0, mean over layers.
    """
    n_q = n_q or state.embed.shape[0]
    b, t, d = x.shape
    flat = x.reshape(-1, d)

    if train:
        # k-means init on the first batch (core_vq.py:141-150). Under
        # shard_map the init must see the SAME (global) data on every replica.
        def do_init(st: RVQState) -> RVQState:
            embeds, counts = [], []
            data = _global_pool(axis_name, flat)
            for i in range(state.embed.shape[0]):
                ki = jax.random.fold_in(key, 1000 + i)
                m, c = _kmeans(ki, data, st.embed.shape[1],
                               seeding=kmeans_seeding)
                embeds.append(m)
                counts.append(c)
                # next layer initializes on this layer's residuals
                idx = _nearest(data, m)
                data = data - m[idx]
            embed = jnp.stack(embeds)
            size = jnp.stack(counts)
            # embed_avg = embed * cluster_size keeps embed ≈ embed_avg/size a
            # fixed point; the reference's embed_avg=embed (core_vq.py:146)
            # collapses the codebook by 1/cluster_size on the first update.
            return RVQState(
                embed=embed,
                embed_avg=embed * size[..., None],
                cluster_size=size,
                inited=jnp.asarray(True),
            )

        # under shard_map the init branch sees all_gather'd (device-varying)
        # data while the identity branch is replica-invariant; lax.cond needs
        # both branches at the same varying type, so promote each leaf
        def _vary(x):
            if axis_name is None:
                return x
            if axis_name in getattr(jax.typeof(x), "vma", ()):
                return x
            return jax.lax.pcast(x, axis_name, to="varying")

        vary_tree = lambda t: jax.tree_util.tree_map(_vary, t)  # noqa: E731
        state = jax.lax.cond(
            state.inited, lambda s: vary_tree(s), lambda s: vary_tree(do_init(s)), state
        )

    quantized_out = jnp.zeros_like(flat)
    residual = flat
    losses = []
    codes = []
    new_embed, new_avg, new_size = [], [], []

    for i in range(n_q):
        idx = _nearest(residual, state.embed[i])
        quant = state.embed[i][idx]
        codes.append(idx.reshape(b, t))

        if train:
            onehot = jax.nn.one_hot(idx, state.embed.shape[1], dtype=residual.dtype)
            e, a, c = _layer_update(
                (state.embed[i], state.embed_avg[i], state.cluster_size[i]),
                residual,
                onehot,
                jax.random.fold_in(key, i),
                decay,
                epsilon,
                threshold_ema_dead_code,
                axis_name,
            )
            new_embed.append(e)
            new_avg.append(a)
            new_size.append(c)
            # commitment loss on this layer (core_vq.py:315-318)
            losses.append(jnp.mean((jax.lax.stop_gradient(quant) - residual) ** 2))
            # straight-through (core_vq.py:303-305)
            quant_st = residual + jax.lax.stop_gradient(quant - residual)
        else:
            losses.append(jnp.zeros(()))
            quant_st = quant

        residual = residual - jax.lax.stop_gradient(quant)
        quantized_out = quantized_out + quant_st

    if train:
        rest_e = [state.embed[i] for i in range(n_q, state.embed.shape[0])]
        rest_a = [state.embed_avg[i] for i in range(n_q, state.embed.shape[0])]
        rest_c = [state.cluster_size[i] for i in range(n_q, state.embed.shape[0])]
        state = RVQState(
            embed=jnp.stack(new_embed + rest_e),
            embed_avg=jnp.stack(new_avg + rest_a),
            cluster_size=jnp.stack(new_size + rest_c),
            inited=state.inited,
        )

    commit_loss = jnp.mean(jnp.stack(losses))
    return quantized_out.reshape(b, t, d), jnp.stack(codes), commit_loss, state
