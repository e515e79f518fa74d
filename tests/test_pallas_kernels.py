"""Pallas kernel numerics vs the XLA reference implementations (interpret mode
on CPU; the same code path compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.ops.attention import (
    cross_attention_bidirectional,
    self_attention,
)
from gluefactory_tpu.ops.pallas_attention import fused_attention, fused_cross_attention


class TestFusedAttention:
    @pytest.mark.parametrize("nq,nk", [(64, 64), (128, 256), (200, 100)])
    def test_matches_xla(self, rng, nq, nk):
        b, h, d = 2, 2, 64
        q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
        out = fused_attention(q, k, v)
        ref = self_attention(q, k, v, None, impl="xla")
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_masked_matches_xla(self, rng):
        b, h, n, d = 1, 4, 96, 64
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        mask = jnp.asarray(rng.rand(b, n) > 0.3)
        out = fused_attention(q, k, v, mask, mask)
        ref = self_attention(q, k, v, mask, impl="xla")
        valid = np.asarray(mask[0])
        np.testing.assert_allclose(
            np.asarray(out)[:, :, valid], np.asarray(ref)[:, :, valid],
            atol=2e-5, rtol=1e-4,
        )
        # invalid rows are exact zeros in the kernel
        assert np.all(np.asarray(out)[:, :, ~valid] == 0)

    def test_all_masked_is_zero(self, rng):
        b, h, n, d = 1, 1, 64, 64
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        mask = jnp.zeros((b, n), bool)
        out = fused_attention(q, q, q, mask, mask)
        assert np.all(np.asarray(out) == 0)


class TestFusedCrossAttention:
    def test_matches_xla_bidirectional(self, rng):
        b, h, m, n, d = 2, 2, 80, 112, 64
        qk0 = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        qk1 = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        v0 = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        v1 = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        mask0 = jnp.asarray(rng.rand(b, m) > 0.2)
        mask1 = jnp.asarray(rng.rand(b, n) > 0.2)
        m0_k, m1_k = fused_cross_attention(qk0, qk1, v0, v1, mask0, mask1)
        m0_r, m1_r = cross_attention_bidirectional(
            qk0, qk1, v0, v1, mask0, mask1, impl="xla"
        )
        v0m = np.asarray(mask0)
        v1m = np.asarray(mask1)
        for bi in range(b):
            np.testing.assert_allclose(
                np.asarray(m0_k)[bi][:, v0m[bi]],
                np.asarray(m0_r)[bi][:, v0m[bi]],
                atol=2e-5, rtol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(m1_k)[bi][:, v1m[bi]],
                np.asarray(m1_r)[bi][:, v1m[bi]],
                atol=2e-5, rtol=1e-4,
            )


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])


class TestFusedAttentionVJP:
    def test_gradients_match_xla(self, rng):
        import jax

        b, h, n, d = 1, 2, 96, 64
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        mask = jnp.asarray(rng.rand(b, n) > 0.25)

        def loss_pallas(q, k, v):
            return (fused_attention(q, k, v, mask, mask) ** 2).sum()

        def loss_xla(q, k, v):
            return (self_attention(q, k, v, mask, impl="xla") ** 2).sum()

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3)

    def test_rectangular_and_unmasked(self, rng):
        import jax

        b, h, m, n, d = 2, 1, 80, 112, 64
        q = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)

        def loss_pallas(q, k, v):
            return fused_attention(q, k, v).sum()

        def loss_xla(q, k, v):
            return self_attention(q, k, v, None, impl="xla").sum()

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3)


class TestBidirectionalCrossKernel:
    def test_forward_matches_xla_multi_block(self, rng):
        # m spans multiple q blocks to exercise the online column softmax
        b, h, m, n, d = 1, 2, 300, 112, 64
        qk0 = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        qk1 = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        v0 = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        v1 = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        mask0 = jnp.asarray(rng.rand(b, m) > 0.2)
        mask1 = jnp.asarray(rng.rand(b, n) > 0.2)
        m0_k, m1_k = fused_cross_attention(qk0, qk1, v0, v1, mask0, mask1)
        m0_r, m1_r = cross_attention_bidirectional(
            qk0, qk1, v0, v1, mask0, mask1, impl="xla"
        )
        v0m, v1m = np.asarray(mask0[0]), np.asarray(mask1[0])
        np.testing.assert_allclose(
            np.asarray(m0_k)[0][:, v0m], np.asarray(m0_r)[0][:, v0m],
            atol=3e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(m1_k)[0][:, v1m], np.asarray(m1_r)[0][:, v1m],
            atol=3e-5, rtol=1e-4,
        )

    def test_gradients(self, rng):
        import jax

        b, h, m, n, d = 1, 1, 160, 96, 64
        qk0 = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        qk1 = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
        v0 = jnp.asarray(rng.randn(b, h, m, d), jnp.float32)
        v1 = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)

        def loss_k(qk0, qk1, v0, v1):
            a, b_ = fused_cross_attention(qk0, qk1, v0, v1)
            return (a**2).sum() + (b_**2).sum()

        def loss_r(qk0, qk1, v0, v1):
            a, b_ = cross_attention_bidirectional(qk0, qk1, v0, v1, impl="xla")
            return (a**2).sum() + (b_**2).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(qk0, qk1, v0, v1)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(qk0, qk1, v0, v1)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-3, rtol=1e-3)


class TestPackedKernels:
    """The packed (B, N, H*Dh) entries must match the per-head XLA reference
    exactly: heads as in-kernel channel slices, no layout transposes."""

    @pytest.mark.parametrize("masked", [False, True])
    def test_self_packed_matches_xla(self, rng, masked):
        from gluefactory_tpu.ops.attention import self_attention_packed
        from gluefactory_tpu.ops.pallas_attention import fused_attention_packed

        b, n, heads, dh = 2, 200, 4, 32
        d = heads * dh
        q = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        mask = jnp.asarray(rng.rand(b, n) > 0.3) if masked else None
        out = fused_attention_packed(q, k, v, mask, mask, heads)
        ref = self_attention_packed(q, k, v, mask, num_heads=heads, impl="xla")
        if masked:
            valid = np.asarray(mask)
            np.testing.assert_allclose(
                np.asarray(out)[valid], np.asarray(ref)[valid], atol=2e-5, rtol=1e-4
            )
            assert np.abs(np.asarray(out)[~valid]).max() == 0.0
        else:
            np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_cross_packed_matches_xla_multi_block(self, rng):
        from gluefactory_tpu.ops.attention import (
            cross_attention_bidirectional_packed,
        )
        from gluefactory_tpu.ops.pallas_attention import (
            fused_cross_attention_packed,
        )

        # m spans multiple q blocks: exercises the per-head online col softmax
        b, m, n, heads, dh = 1, 300, 112, 2, 64
        d = heads * dh
        qk0 = jnp.asarray(rng.randn(b, m, d), jnp.float32)
        qk1 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        v0 = jnp.asarray(rng.randn(b, m, d), jnp.float32)
        v1 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        mask0 = jnp.asarray(rng.rand(b, m) > 0.2)
        mask1 = jnp.asarray(rng.rand(b, n) > 0.2)
        m0_k, m1_k = fused_cross_attention_packed(
            qk0, qk1, v0, v1, mask0, mask1, heads
        )
        m0_r, m1_r = cross_attention_bidirectional_packed(
            qk0, qk1, v0, v1, mask0, mask1, num_heads=heads, impl="xla"
        )
        v0m, v1m = np.asarray(mask0[0]), np.asarray(mask1[0])
        np.testing.assert_allclose(
            np.asarray(m0_k)[0][v0m], np.asarray(m0_r)[0][v0m], atol=3e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(m1_k)[0][v1m], np.asarray(m1_r)[0][v1m], atol=3e-5, rtol=1e-4
        )

    def test_stacked_cross_matches_packed(self, rng):
        """The stacked-sets entry (both sets on the batch axis, halves read
        via BlockSpec index maps) must equal the two-array packed entry."""
        import jax

        from gluefactory_tpu.ops.pallas_attention import (
            fused_cross_attention_packed,
            fused_cross_attention_stacked,
        )

        b, n, heads, dh = 2, 300, 2, 32  # n spans multiple q blocks
        d = heads * dh
        qk0 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        qk1 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        v0 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        v1 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        mask0 = jnp.asarray(rng.rand(b, n) > 0.2)
        mask1 = jnp.asarray(rng.rand(b, n) > 0.2)
        qk = jnp.concatenate([qk0, qk1], 0)
        v = jnp.concatenate([v0, v1], 0)
        mask = jnp.concatenate([mask0, mask1], 0)

        m0_s, m1_s = fused_cross_attention_stacked(qk, v, mask, heads)
        m0_p, m1_p = fused_cross_attention_packed(
            qk0, qk1, v0, v1, mask0, mask1, heads
        )
        np.testing.assert_allclose(
            np.asarray(m0_s), np.asarray(m0_p), atol=3e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(m1_s), np.asarray(m1_p), atol=3e-5, rtol=1e-4
        )

        # gradients: stacked VJP vs packed VJP
        gs = jax.grad(
            lambda qk, v: sum(
                (t**2).sum() for t in fused_cross_attention_stacked(qk, v, mask, heads)
            ),
            argnums=(0, 1),
        )(qk, v)
        gp = jax.grad(
            lambda a, c, x, y: sum(
                (t**2).sum()
                for t in fused_cross_attention_packed(a, c, x, y, mask0, mask1, heads)
            ),
            argnums=(0, 1, 2, 3),
        )(qk0, qk1, v0, v1)
        np.testing.assert_allclose(
            np.asarray(gs[0]), np.concatenate([gp[0], gp[1]], 0), atol=3e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(gs[1]), np.concatenate([gp[2], gp[3]], 0), atol=3e-3, rtol=1e-3
        )

    def test_bf16_io_close_to_f32(self, rng):
        """bf16 activations flow through the packed kernels (half-cast
        attention, reference lightglue.py:143): close to the f32 path."""
        from gluefactory_tpu.ops.pallas_attention import (
            fused_attention_packed,
            fused_cross_attention_packed,
        )

        b, n, heads, dh = 1, 128, 2, 64
        d = heads * dh
        q = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        mask = jnp.asarray(rng.rand(b, n) > 0.25)
        ref = fused_attention_packed(q, k, v, mask, mask, heads)
        out = fused_attention_packed(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            mask, mask, heads,
        )
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
        )
        m0r, m1r = fused_cross_attention_packed(q, k, v, v, mask, mask, heads)
        m0b, m1b = fused_cross_attention_packed(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), v.astype(jnp.bfloat16), mask, mask, heads,
        )
        np.testing.assert_allclose(
            np.asarray(m0b, np.float32), np.asarray(m0r), atol=5e-2, rtol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(m1b, np.float32), np.asarray(m1r), atol=5e-2, rtol=5e-2
        )

    def test_packed_gradients(self, rng):
        import jax

        from gluefactory_tpu.ops.attention import (
            cross_attention_bidirectional_packed,
            self_attention_packed,
        )
        from gluefactory_tpu.ops.pallas_attention import (
            fused_attention_packed,
            fused_cross_attention_packed,
        )

        b, n, heads, dh = 1, 96, 2, 32
        d = heads * dh
        q = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, n, d), jnp.float32)
        mask = jnp.asarray(rng.rand(b, n) > 0.25)

        gp = jax.grad(
            lambda q, k, v: (fused_attention_packed(q, k, v, mask, mask, heads) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gx = jax.grad(
            lambda q, k, v: (
                self_attention_packed(q, k, v, mask, num_heads=heads, impl="xla") ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3)

        gp = jax.grad(
            lambda a, c, x, y: sum(
                (t**2).sum()
                for t in fused_cross_attention_packed(a, c, x, y, mask, mask, heads)
            ),
            argnums=(0, 1, 2, 3),
        )(q, k, v, v)
        gx = jax.grad(
            lambda a, c, x, y: sum(
                (t**2).sum()
                for t in cross_attention_bidirectional_packed(
                    a, c, x, y, mask, mask, num_heads=heads, impl="xla"
                )
            ),
            argnums=(0, 1, 2, 3),
        )(q, k, v, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-3, rtol=1e-3)


class TestFusedAssignment:
    def _inputs(self, rng, b, m, n, d, masked=True):
        d0 = jnp.asarray(rng.randn(b, m, d), jnp.float32) / d**0.25
        d1 = jnp.asarray(rng.randn(b, n, d), jnp.float32) / d**0.25
        z0 = jnp.asarray(rng.randn(b, m), jnp.float32)
        z1 = jnp.asarray(rng.randn(b, n), jnp.float32)
        mask0 = jnp.asarray(rng.rand(b, m) > 0.25) if masked else None
        mask1 = jnp.asarray(rng.rand(b, n) > 0.25) if masked else None
        return d0, d1, z0, z1, mask0, mask1

    @pytest.mark.parametrize("m,n,masked", [(96, 96, False), (200, 130, True), (300, 260, True)])
    def test_scores_match_xla(self, rng, m, n, masked):
        from gluefactory_tpu.ops.assignment import sigmoid_log_double_softmax
        from gluefactory_tpu.ops.pallas_assignment import fused_log_assignment

        b, d = 2, 64
        d0, d1, z0, z1, mask0, mask1 = self._inputs(rng, b, m, n, d, masked)
        sim = jnp.einsum("bmd,bnd->bmn", d0, d1)
        ref = sigmoid_log_double_softmax(sim, z0[..., None], z1[..., None], mask0, mask1)
        scores, *_ = fused_log_assignment(d0, d1, z0, z1, mask0, mask1)
        np.testing.assert_allclose(np.asarray(scores), np.asarray(ref), atol=5e-5, rtol=1e-4)

    @pytest.mark.parametrize("th", [0.0, 0.1])
    def test_filter_stats_match_filter_matches(self, rng, th):
        from gluefactory_tpu.ops.assignment import (
            filter_matches,
            sigmoid_log_double_softmax,
        )
        from gluefactory_tpu.ops.pallas_assignment import (
            filter_matches_from_stats,
            fused_log_assignment,
        )

        b, m, n, d = 2, 180, 140, 64
        d0, d1, z0, z1, mask0, mask1 = self._inputs(rng, b, m, n, d, True)
        sim = jnp.einsum("bmd,bnd->bmn", d0, d1)
        ref = sigmoid_log_double_softmax(sim, z0[..., None], z1[..., None], mask0, mask1)
        rm0, rm1, rs0, rs1 = filter_matches(ref, th)
        _, rowmax, rowarg, colmax, colarg = fused_log_assignment(d0, d1, z0, z1, mask0, mask1)
        km0, km1, ks0, ks1 = filter_matches_from_stats(rowmax, rowarg, colmax, colarg, th)
        np.testing.assert_array_equal(np.asarray(km0), np.asarray(rm0))
        np.testing.assert_array_equal(np.asarray(km1), np.asarray(rm1))
        np.testing.assert_allclose(np.asarray(ks0), np.asarray(rs0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ks1), np.asarray(rs1), atol=1e-5)


class TestBlock0Fused:
    def test_matches_xla_s2d_path(self, rng):
        """block0_fused == s2d conv pair + relu/BN + mask + group-max pool
        (the production XLA path in superpoint_open)."""
        import jax
        import jax.numpy as jnp

        from gluefactory_tpu.models.extractors.superpoint_open import (
            _mask_p1,
            _space_to_depth,
            s2d_conv,
        )
        from gluefactory_tpu.ops.pallas_conv import block0_fused

        B, H, W = 2, 64, 96
        img = jnp.asarray(rng.rand(B, H, W, 1), jnp.float32)
        w1 = jnp.asarray(rng.randn(3, 3, 1, 64) * 0.3, jnp.float32)
        w2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
        mul1 = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
        add1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
        mul2 = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
        add2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

        # reference: the model's s2d path in bf16 (same compute dtype)
        dt = jnp.bfloat16
        xs = _space_to_depth(img.astype(dt))
        y = s2d_conv(xs, w1, b1, "p0_to_p1", dtype=dt)
        y = jax.nn.relu(y)
        y = y * jnp.tile(mul1, 4).astype(dt) + jnp.tile(add1, 4).astype(dt)
        y = _mask_p1(y)
        y = jax.lax.conv_general_dilated(
            y, jnp.asarray(
                __import__("gluefactory_tpu.models.extractors.superpoint_open",
                           fromlist=["_s2d_kernel"])._s2d_kernel(w2), dt
            ),
            (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(b2, 4).astype(dt)
        y = jax.nn.relu(y)
        y = y * jnp.tile(mul2, 4).astype(dt) + jnp.tile(add2, 4).astype(dt)
        bb, hh, ww, _ = y.shape
        ref = y.reshape(bb, hh, ww, 2, 2, 64).max(axis=(3, 4))

        out = block0_fused(
            img, w1, b1, mul1, add1, w2, b2, mul2, add2, interpret=True
        )
        assert out.shape == (B, H // 2, W // 2, 64)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )
