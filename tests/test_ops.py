import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.ops.kmeans import kmeans
from mas_tpu.ops.norms import group_norm, group_norm_swish, layer_norm, swish
from mas_tpu.ops.vq import vq_argmin, vq_argmin_jnp, vq_quantize


class TestVQ:
    def test_jnp_matches_bruteforce(self):
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (37, 16))
        cb = jax.random.normal(jax.random.PRNGKey(1), (50, 16))
        d = np.linalg.norm(np.array(z)[:, None] - np.array(cb)[None], axis=-1)
        expected = d.argmin(axis=1)
        got = vq_argmin_jnp(z, cb)
        np.testing.assert_array_equal(np.array(got), expected)

    def test_pallas_interpret_matches_jnp(self):
        key = jax.random.PRNGKey(2)
        z = jax.random.normal(key, (300, 64))   # non-multiple of tile => pad
        cb = jax.random.normal(jax.random.PRNGKey(3), (128, 64))
        ref = vq_argmin(z, cb, impl="jnp")
        got = vq_argmin(z, cb, impl="pallas_interpret")
        np.testing.assert_array_equal(np.array(got), np.array(ref))

    def test_quantize_shapes(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
        cb = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        z_q, idx = vq_quantize(z, cb, impl="jnp")
        assert z_q.shape == (2, 4, 4, 8)
        assert idx.shape == (2, 4, 4)
        np.testing.assert_allclose(np.array(z_q[0, 0, 0]),
                                   np.array(cb[idx[0, 0, 0]]), rtol=1e-6)


class TestNorms:
    def test_group_norm_matches_torch(self):
        import torch
        x = np.random.RandomState(0).randn(2, 8, 8, 64).astype(np.float32)
        scale = np.random.RandomState(1).randn(64).astype(np.float32)
        bias = np.random.RandomState(2).randn(64).astype(np.float32)
        got = group_norm(jnp.asarray(x), jnp.asarray(scale),
                         jnp.asarray(bias), num_groups=32, eps=1e-6)
        ref = torch.nn.functional.group_norm(
            torch.from_numpy(x).permute(0, 3, 1, 2), 32,
            torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.array(got), ref, atol=1e-5)

    def test_layer_norm_matches_torch(self):
        import torch
        x = np.random.RandomState(0).randn(2, 5, 32).astype(np.float32)
        s = np.random.RandomState(1).randn(32).astype(np.float32)
        b = np.random.RandomState(2).randn(32).astype(np.float32)
        got = layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b))
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (32,), torch.from_numpy(s),
            torch.from_numpy(b), eps=1e-5).numpy()
        np.testing.assert_allclose(np.array(got), ref, atol=1e-5)

    def test_swish_matches_torch(self):
        import torch
        x = np.random.RandomState(0).randn(128).astype(np.float32)
        got = swish(jnp.asarray(x))
        ref = (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy()
        np.testing.assert_allclose(np.array(got), ref, atol=1e-6)

    def test_gn_swish_fwd_only_vjp_matches_jnp(self):
        """gn_swish_pallas_fwd_only (the TPU 'auto' path): off-TPU the fwd
        falls back to jnp, and the VJP is the jnp-recompute backward —
        grads must be bit-identical to grads of the plain jnp path."""
        from mas_tpu.ops.pallas.gn_swish import gn_swish_pallas_fwd_only

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64))
        s = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (64,))
        b = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (64,))
        ref = jax.grad(lambda *a: jnp.sum(
            swish(group_norm(*a, 32, 1e-6))), argnums=(0, 1, 2))(x, s, b)
        got = jax.grad(lambda *a: jnp.sum(
            gn_swish_pallas_fwd_only(*a, 32, 1e-6)), argnums=(0, 1, 2))(
                x, s, b)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.array(g), np.array(r), atol=1e-6)

    def test_group_norm_swish_env_override(self, monkeypatch):
        """MAS_GN_IMPL env var resolves impl='auto' (the gan_trace A/B
        hook); explicit impl args ignore it."""
        from mas_tpu.ops import norms

        x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 64))
        s = jnp.ones((64,))
        b = jnp.zeros((64,))
        ref = norms.group_norm_swish(x, s, b, impl="jnp")
        monkeypatch.setenv("MAS_GN_IMPL", "pallas")
        # CPU: the pallas entry falls back to jnp internally => same values
        got = norms.group_norm_swish(x, s, b, impl="auto")
        np.testing.assert_allclose(np.array(got), np.array(ref), atol=1e-6)
        monkeypatch.setenv("MAS_GN_IMPL", "jnp")
        got = norms.group_norm_swish(x, s, b, impl="auto")
        np.testing.assert_allclose(np.array(got), np.array(ref), atol=1e-6)

    def test_gn_swish_pallas_interpret(self):
        from mas_tpu.ops.pallas.gn_swish import _gn_swish_fwd_pallas
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
        s = jax.random.normal(jax.random.PRNGKey(1), (64,))
        b = jax.random.normal(jax.random.PRNGKey(2), (64,))
        ref = swish(group_norm(x, s, b, 32, 1e-6))
        got = _gn_swish_fwd_pallas(x, s, b, 32, 1e-6, interpret=True)
        np.testing.assert_allclose(np.array(got), np.array(ref), atol=1e-5)

    def test_ln_pallas_fwd_interpret(self):
        from mas_tpu.ops.pallas.layer_norm import _ln_fwd_pallas
        # 1024 rows x 1024 d => multiple row tiles (bufs budget caps at 256)
        x = jax.random.normal(jax.random.PRNGKey(0), (1024, 1024),
                              jnp.float32)
        s = jax.random.normal(jax.random.PRNGKey(1), (1024,))
        b = jax.random.normal(jax.random.PRNGKey(2), (1024,))
        ref = layer_norm(x, s, b, 1e-5)
        out = _ln_fwd_pallas(x, s, b, 1e-5, interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-5)

    def test_ln_pallas_bwd_interpret(self):
        from mas_tpu.ops.pallas.layer_norm import _ln_bwd_pallas
        x = jax.random.normal(jax.random.PRNGKey(0), (1024, 1024),
                              jnp.float32)
        s = jax.random.normal(jax.random.PRNGKey(1), (1024,))
        b = jax.random.normal(jax.random.PRNGKey(2), (1024,))
        g = jax.random.normal(jax.random.PRNGKey(3), (1024, 1024),
                              jnp.float32)
        _, vjp = jax.vjp(lambda x_, s_, b_: layer_norm(x_, s_, b_, 1e-5),
                         x, s, b)
        dx_ref, ds_ref, db_ref = vjp(g)
        dx, ds, db = _ln_bwd_pallas(x, g, s, 1e-5, interpret=True)
        np.testing.assert_allclose(np.array(dx), np.array(dx_ref), atol=2e-5)
        # dscale/dbias sum 1024 rows; tolerance scales with the reduction
        np.testing.assert_allclose(np.array(ds), np.array(ds_ref), atol=3e-3)
        np.testing.assert_allclose(np.array(db), np.array(db_ref), atol=3e-3)

    def test_ln_pallas_cpu_fallback_grads(self):
        # off-TPU ln_pallas must route to jnp in both fwd and bwd
        from mas_tpu.ops.pallas.layer_norm import ln_pallas
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 128))
        s = jnp.ones((128,))
        b = jnp.zeros((128,))
        ref, vjp_ref = jax.vjp(
            lambda x_, s_, b_: layer_norm(x_, s_, b_, 1e-5), x, s, b)
        got, vjp_got = jax.vjp(
            lambda x_, s_, b_: ln_pallas(x_, s_, b_, 1e-5), x, s, b)
        np.testing.assert_allclose(np.array(got), np.array(ref), atol=1e-6)
        g = jnp.ones_like(ref)
        for a, e in zip(vjp_got(g), vjp_ref(g)):
            np.testing.assert_allclose(np.array(a), np.array(e), atol=1e-5)

    def test_gn_swish_fwd_stats_interpret(self):
        from mas_tpu.ops.pallas.gn_swish import _gn_swish_fwd_stats_pallas
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
        s = jax.random.normal(jax.random.PRNGKey(1), (64,))
        b = jax.random.normal(jax.random.PRNGKey(2), (64,))
        got, stats = _gn_swish_fwd_stats_pallas(x, s, b, 32, 1e-6,
                                                interpret=True)
        ref = swish(group_norm(x, s, b, 32, 1e-6))
        np.testing.assert_allclose(np.array(got), np.array(ref), atol=1e-5)
        # stats rows are (mean, rstd) per batch x group
        xg = np.array(x).reshape(2, 64, 32, 2)          # [B, HW, G, cpg]
        mean_ref = xg.transpose(0, 2, 1, 3).reshape(2, 32, -1).mean(-1)
        var_ref = xg.transpose(0, 2, 1, 3).reshape(2, 32, -1).var(-1)
        np.testing.assert_allclose(np.array(stats[:, 0]), mean_ref, atol=1e-5)
        np.testing.assert_allclose(np.array(stats[:, 1]),
                                   1.0 / np.sqrt(var_ref + 1e-6), atol=1e-4)

    @pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32),
                                              ((1, 16, 16, 128), 32),
                                              ((3, 8, 4, 96), 16)])
    def test_gn_swish_bwd_pallas_interpret(self, shape, groups):
        from mas_tpu.ops.pallas.gn_swish import (_gn_swish_bwd_pallas,
                                                 _gn_swish_fwd_stats_pallas)
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        c = shape[-1]
        x = jax.random.normal(keys[0], shape)
        s = jax.random.normal(keys[1], (c,)) * 0.5 + 1.0
        b = jax.random.normal(keys[2], (c,)) * 0.1
        g = jax.random.normal(keys[3], shape)
        _, vjp = jax.vjp(
            lambda x_, s_, b_: swish(group_norm(x_, s_, b_, groups, 1e-6)),
            x, s, b)
        dx_ref, ds_ref, db_ref = vjp(g)
        _, stats = _gn_swish_fwd_stats_pallas(x, s, b, groups, 1e-6,
                                              interpret=True)
        dx, ds, db = _gn_swish_bwd_pallas(x, g, s, b, stats, groups,
                                          interpret=True)
        np.testing.assert_allclose(np.array(dx), np.array(dx_ref), atol=2e-5)
        # param grads reduce over B*H*W rows; tolerance scales with that
        np.testing.assert_allclose(np.array(ds), np.array(ds_ref), atol=1e-4)
        np.testing.assert_allclose(np.array(db), np.array(db_ref), atol=1e-4)

    def test_gn_swish_bwd_pallas_interpret_bf16(self):
        from mas_tpu.ops.pallas.gn_swish import (_gn_swish_bwd_pallas,
                                                 _gn_swish_fwd_stats_pallas)
        keys = jax.random.split(jax.random.PRNGKey(9), 4)
        x = jax.random.normal(keys[0], (2, 8, 8, 64), jnp.bfloat16)
        s = jnp.ones((64,))
        b = jnp.zeros((64,))
        g = jax.random.normal(keys[3], (2, 8, 8, 64), jnp.bfloat16)
        xf, gf = x.astype(jnp.float32), g.astype(jnp.float32)
        _, vjp = jax.vjp(
            lambda x_, s_, b_: swish(group_norm(x_, s_, b_, 32, 1e-6)),
            xf, s, b)
        dx_ref, ds_ref, db_ref = vjp(gf)
        _, stats = _gn_swish_fwd_stats_pallas(x, s, b, 32, 1e-6,
                                              interpret=True)
        dx, ds, db = _gn_swish_bwd_pallas(x, g, s, b, stats, 32,
                                          interpret=True)
        assert dx.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.array(dx, np.float32),
                                   np.array(dx_ref), atol=0.03)
        np.testing.assert_allclose(np.array(ds), np.array(ds_ref), atol=0.5)
        np.testing.assert_allclose(np.array(db), np.array(db_ref), atol=0.5)

    def test_gn_swish_grad(self):
        from mas_tpu.ops.pallas.gn_swish import gn_swish_pallas
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32))
        s = jnp.ones((32,))
        b = jnp.zeros((32,))

        def f_ref(x_):
            return jnp.sum(swish(group_norm(x_, s, b, 32, 1e-6)))

        def f_pal(x_):
            return jnp.sum(gn_swish_pallas(x_, s, b, 32, 1e-6))

        g_ref = jax.grad(f_ref)(x)
        g_pal = jax.grad(f_pal)(x)
        np.testing.assert_allclose(np.array(g_pal), np.array(g_ref),
                                   atol=1e-5)


class TestKMeans:
    def test_recovers_separated_clusters(self):
        rs = np.random.RandomState(0)
        centers = rs.randn(4, 8) * 10
        pts = np.concatenate(
            [c + 0.01 * rs.randn(100, 8) for c in centers], axis=0)
        got = kmeans(jnp.asarray(pts, jnp.float32), jax.random.PRNGKey(0),
                     n_clusters=4, iters=20, chunk=128)
        got = np.array(got)
        # each true center should be close to some centroid
        for c in centers:
            assert np.min(np.linalg.norm(got - c, axis=1)) < 0.5

    def test_partial_validity(self):
        rs = np.random.RandomState(1)
        pts = np.zeros((128, 4), np.float32)
        pts[:64] = rs.randn(64, 4) + 100.0   # only first 64 rows valid
        got = kmeans(jnp.asarray(pts), jax.random.PRNGKey(0), n_clusters=8,
                     iters=5, chunk=32, n_valid=jnp.asarray(64))
        # centroids should live near the valid cluster, not at the zeros
        assert np.all(np.linalg.norm(np.array(got), axis=1) > 50.0)

    def test_init_without_replacement(self):
        """The n_valid init path must pick DISTINCT rows: with-replacement
        sampling seeded ~K^2/2N duplicate centroids per re-init, and
        duplicates survive Lloyd as permanently dead codes (argmin ties
        pick the lower index; the twin keeps count 0 forever)."""
        rs = np.random.RandomState(2)
        pts = rs.randn(300, 4).astype(np.float32)   # all rows distinct
        # iters=0 isolates the init selection itself
        got = np.array(kmeans(jnp.asarray(pts), jax.random.PRNGKey(0),
                              n_clusters=256, iters=0, chunk=64,
                              n_valid=jnp.asarray(280)))
        assert len(np.unique(got, axis=0)) == 256
        # and every pick came from the valid prefix
        valid = {tuple(r) for r in pts[:280]}
        assert all(tuple(r) in valid for r in got)
