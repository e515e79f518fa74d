"""Parity tests for the whole-block LightGlue layer megakernels
(ops/pallas_lightglue_block.py) against the unfused scan path.

The fused path runs the Pallas kernels in interpret mode on CPU, so these
tests exercise the same kernel bodies that run compiled on TPU (tolerances
cover the approx-reciprocal softmax normalization and the polynomial erf).
Reference semantics: gluefactory/models/matchers/lightglue.py:159-281.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.ops.attention import apply_rotary, rotate_half
from gluefactory_tpu.ops.pallas_lightglue_block import rotary_tables


def _data(rng, b, n, d=256, masked=False):
    data = {
        "keypoints0": jnp.asarray(rng.rand(b, n, 2) * 400, jnp.float32),
        "keypoints1": jnp.asarray(rng.rand(b, n, 2) * 400, jnp.float32),
        "descriptors0": jnp.asarray(rng.randn(b, n, d), jnp.float32),
        "descriptors1": jnp.asarray(rng.randn(b, n, d), jnp.float32),
        "view0": {"image_size": jnp.full((b, 2), 400.0)},
        "view1": {"image_size": jnp.full((b, 2), 400.0)},
    }
    if masked:
        m0 = np.ones((b, n), bool)
        m1 = np.ones((b, n), bool)
        m0[:, -n // 4:] = False
        m1[:, -n // 3:] = False
        data["keypoint_mask0"] = jnp.asarray(m0)
        data["keypoint_mask1"] = jnp.asarray(m1)
    return data


class TestRotaryTables:
    def test_roll_form_matches_apply_rotary(self, rng):
        """t*cos + roll(t,-1)*sin_a + roll(t,+1)*sin_b == apply_rotary."""
        t = jnp.asarray(rng.randn(2, 64, 256), jnp.float32)
        enc = jnp.asarray(rng.randn(2, 2, 64, 256), jnp.float32)
        cos, sin_a, sin_b = rotary_tables(enc)
        rolled = (
            t * cos
            + jnp.roll(t, -1, axis=-1) * sin_a
            + jnp.roll(t, 1, axis=-1) * sin_b
        )
        np.testing.assert_allclose(
            rolled, apply_rotary(t, enc), atol=1e-5, rtol=1e-5
        )

    def test_rotate_half_identity(self, rng):
        """Sanity: the sign-folding identity rot_half(t)*sin decomposes into
        the two rolls (documents the lane convention the kernel relies on)."""
        t = jnp.asarray(rng.randn(4, 128), jnp.float32)
        sin = jnp.asarray(rng.randn(4, 128), jnp.float32)
        lane = np.arange(128)
        sin_a = jnp.asarray(np.where(lane % 2 == 0, -1.0, 0.0)) * sin
        sin_b = jnp.asarray(np.where(lane % 2 == 0, 0.0, 1.0)) * sin
        rolled = jnp.roll(t, -1, axis=-1) * sin_a + jnp.roll(t, 1, axis=-1) * sin_b
        np.testing.assert_allclose(rolled, rotate_half(t) * sin, atol=1e-6)


class TestFusedLayerParity:
    @pytest.mark.parametrize("n", [128, 256])
    def test_forward_matches_unfused(self, rng, n):
        data = _data(rng, 2, n)
        m_off = get_model("lightglue").from_conf(
            {"fused_layer": False, "filter_threshold": 0.1}
        )
        params = m_off.init(jax.random.PRNGKey(0), data)
        out_ref = m_off.apply(params, data)
        m_on = get_model("lightglue").from_conf(
            {"fused_layer": True, "filter_threshold": 0.1}
        )
        out_fused = m_on.apply(params, data)
        np.testing.assert_allclose(
            out_ref["log_assignment"], out_fused["log_assignment"], atol=5e-3
        )
        assert (out_ref["matches0"] == out_fused["matches0"]).mean() > 0.99

    def test_forward_matches_unfused_masked(self, rng):
        """Padding discipline: masked tokens must not influence survivors."""
        data = _data(rng, 2, 128, masked=True)
        m_off = get_model("lightglue").from_conf({"fused_layer": False})
        params = m_off.init(jax.random.PRNGKey(1), data)
        out_ref = m_off.apply(params, data)
        m_on = get_model("lightglue").from_conf({"fused_layer": True})
        out_fused = m_on.apply(params, data)
        np.testing.assert_allclose(
            out_ref["log_assignment"], out_fused["log_assignment"], atol=5e-3
        )
        # padded queries never match
        mask0 = np.asarray(data["keypoint_mask0"])
        assert (np.asarray(out_fused["matches0"])[~mask0] == -1).all()

    def test_large_n_v2_path_matches_unfused(self, rng):
        """N > 1024 routes through the VMEM-lean v2 kernels (compact rotary
        tables, chunk-projected q, FFN fused into the chunk loop) — masked
        parity at N=1152."""
        n = 1152
        data = _data(rng, 1, n)
        m0 = np.ones((1, n), bool)
        m0[:, -300:] = False
        m1 = np.ones((1, n), bool)
        m1[:, -150:] = False
        data["keypoint_mask0"] = jnp.asarray(m0)
        data["keypoint_mask1"] = jnp.asarray(m1)
        m_off = get_model("lightglue").from_conf({"fused_layer": False})
        params = m_off.init(jax.random.PRNGKey(5), data)
        out_ref = m_off.apply(params, data)
        m_on = get_model("lightglue").from_conf({"fused_layer": True})
        out_fused = m_on.apply(params, data)
        np.testing.assert_allclose(
            out_ref["log_assignment"], out_fused["log_assignment"], atol=5e-3
        )
        assert (out_ref["matches0"] == out_fused["matches0"]).mean() > 0.99
        assert (np.asarray(out_fused["matches0"])[~m0] == -1).all()

    def test_adaptive_with_compact_phase_matches_unfused(self, rng):
        """The adaptive while_loop (depth exit + width pruning incl. the
        compact-prefix phase) runs through the fused kernels when the
        widths allow; outputs must match the unfused adaptive path."""
        data = _data(rng, 2, 256)
        base = {
            "filter_threshold": 0.1,
            "depth_confidence": 0.95,
            "width_confidence": 0.99,
            "width_capacity": 0.5,
        }
        m_off = get_model("lightglue").from_conf({**base, "fused_layer": False})
        params = m_off.init(jax.random.PRNGKey(3), data)
        out_ref = m_off.apply(params, data)
        m_on = get_model("lightglue").from_conf({**base, "fused_layer": True})
        out_fused = m_on.apply(params, data)
        assert int(out_ref["stop_layer"]) == int(out_fused["stop_layer"])
        np.testing.assert_allclose(
            out_ref["prune0"], out_fused["prune0"], atol=1e-6
        )
        np.testing.assert_allclose(
            out_ref["log_assignment"], out_fused["log_assignment"], atol=5e-3
        )
        assert (out_ref["matches0"] == out_fused["matches0"]).mean() > 0.99

    def test_padding_invariance(self, rng):
        """Same valid tokens + extra padding -> identical valid outputs."""
        n, extra = 128, 128
        data = _data(rng, 1, n)
        data["keypoint_mask0"] = jnp.ones((1, n), bool)
        data["keypoint_mask1"] = jnp.ones((1, n), bool)
        model = get_model("lightglue").from_conf({"fused_layer": True})
        params = model.init(jax.random.PRNGKey(2), data)
        out = model.apply(params, data)

        pad = lambda t: jnp.pad(t, ((0, 0), (0, extra), (0, 0)))
        data_p = {
            "keypoints0": pad(data["keypoints0"]),
            "keypoints1": pad(data["keypoints1"]),
            "descriptors0": pad(data["descriptors0"]),
            "descriptors1": pad(data["descriptors1"]),
            "keypoint_mask0": jnp.pad(data["keypoint_mask0"], ((0, 0), (0, extra))),
            "keypoint_mask1": jnp.pad(data["keypoint_mask1"], ((0, 0), (0, extra))),
            "view0": data["view0"],
            "view1": data["view1"],
        }
        out_p = model.apply(params, data_p)
        np.testing.assert_array_equal(
            np.asarray(out["matches0"][0]), np.asarray(out_p["matches0"][0, :n])
        )
        np.testing.assert_allclose(
            np.asarray(out["matching_scores0"][0]),
            np.asarray(out_p["matching_scores0"][0, :n]),
            atol=2e-3,
        )
