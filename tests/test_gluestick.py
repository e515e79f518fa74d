"""Tests for the line stack: LSD detector, wireframe extractor, GlueStick
matcher, line GT generation."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.gt_generation import gt_line_matches_from_homography
from gluefactory_tpu.models import get_model


def make_line_image(rng, w=240, h=180, n_lines=8):
    img = np.full((h, w), 0.4, np.float32)
    img += rng.rand(h, w).astype(np.float32) * 0.08
    for _ in range(n_lines):
        p0 = rng.randint([10, 10], [w - 10, h - 10])
        p1 = rng.randint([10, 10], [w - 10, h - 10])
        cv2.line(img, tuple(p0), tuple(p1), float(rng.uniform(0.7, 1.0)), 2)
    return np.clip(img, 0, 1)[..., None]


class TestLSD:
    def test_detects_lines(self, rng):
        img = make_line_image(rng)
        model = get_model("lsd").from_conf({"max_num_lines": 64, "min_length": 20})
        pred = model.apply({}, {"image": jnp.asarray(img[None])})
        mask = np.asarray(pred["line_mask"][0])
        assert mask.sum() >= 4
        lines = np.asarray(pred["lines"][0])[mask]
        lengths = np.linalg.norm(lines[:, 1] - lines[:, 0], axis=-1)
        assert np.all(lengths >= 20)
        scores = np.asarray(pred["line_scores"][0])[mask]
        assert scores.max() <= 1.0 + 1e-6 and scores.max() > 0.5


class TestWireframe:
    def test_junction_layout(self, rng):
        img = make_line_image(rng)
        model = get_model("wireframe").from_conf(
            {
                "point_extractor": {
                    "name": "superpoint_open",
                    "max_num_keypoints": 64,
                    "detection_threshold": 0.0,
                    "channels": [8, 8, 16, 16, 32],
                    "descriptor_dim": 32,
                    "dense_outputs": True,
                },
                "line_extractor": {"name": "lsd", "max_num_lines": 32, "min_length": 20},
            }
        )
        data = {"image": jnp.asarray(img[None])}
        variables = model.init(jax.random.PRNGKey(0), data)
        pred = model.apply(variables, data)
        L, K = 32, 64
        assert pred["keypoints"].shape == (1, 2 * L + K, 2)
        assert pred["descriptors"].shape[1] == 2 * L + K
        assert pred["lines_junc_idx"].shape == (1, L, 2)
        # junction endpoints equal the line endpoints
        lines = np.asarray(pred["lines"][0])
        juncs = np.asarray(pred["keypoints"][0][: 2 * L]).reshape(L, 2, 2)
        np.testing.assert_allclose(lines, juncs, atol=1e-5)


class TestLineGT:
    def test_identity_and_flip(self, rng):
        lines = rng.uniform(20, 200, (1, 10, 2, 2)).astype(np.float32)
        flipped = lines[:, :, ::-1]
        out = gt_line_matches_from_homography(
            jnp.asarray(lines), jnp.asarray(flipped), jnp.eye(3)[None]
        )
        np.testing.assert_array_equal(np.asarray(out["line_matches0"][0]), np.arange(10))

    def test_outliers_unmatched(self, rng):
        lines0 = rng.uniform(20, 200, (1, 8, 2, 2)).astype(np.float32)
        lines1 = lines0.copy()
        lines1[:, 5:] += 300.0
        out = gt_line_matches_from_homography(
            jnp.asarray(lines0), jnp.asarray(lines1), jnp.eye(3)[None]
        )
        m0 = np.asarray(out["line_matches0"][0])
        np.testing.assert_array_equal(m0[:5], np.arange(5))
        assert np.all(m0[5:] == -1)

    def test_pose_depth_lines(self, rng):
        from gluefactory_tpu.geometry import Camera, Pose
        from gluefactory_tpu.geometry.gt_generation import (
            gt_line_matches_from_pose_depth,
        )

        cam = Camera.from_params(64, 48, 60.0, 60.0, 32.0, 24.0)
        T = Pose.from_aa(np.zeros(3), np.array([0.5, 0.0, 0.0]))
        z = 5.0
        depth = jnp.full((1, 48, 64), z)  # fronto-parallel plane
        ep0 = rng.uniform(16, 40, (1, 6, 2, 2)).astype(np.float32)
        # pure x-translation at constant depth shifts projections by fx*tx/z
        shift = np.array([60.0 * 0.5 / z, 0.0], np.float32)
        ep1 = ep0 + shift
        data = {
            "view0": {"camera": cam, "depth": depth},
            "view1": {"camera": cam, "depth": depth},
            "T_0to1": T,
            "T_1to0": T.inv(),
        }
        valid0 = jnp.asarray(np.array([[1, 1, 1, 1, 1, 0]], bool))
        out = gt_line_matches_from_pose_depth(
            jnp.asarray(ep0), jnp.asarray(ep1), data, pos_th=3.0, valid0=valid0
        )
        m0 = np.asarray(out["line_matches0"][0])
        np.testing.assert_array_equal(m0[:5], np.arange(5))
        assert m0[5] == -2  # padded line -> IGNORE


class TestGlueStick:
    def make_data(self, rng, b=1, j=24, L=6, d=32):
        # junctions: 2L line endpoints + (j - 2L) keypoints
        kpts = rng.uniform(10, 200, (b, j, 2)).astype(np.float32)
        lines = kpts[:, : 2 * L].reshape(b, L, 2, 2)
        data = {
            "keypoints0": jnp.asarray(kpts),
            "keypoints1": jnp.asarray(kpts),
            "descriptors0": jnp.asarray(rng.randn(b, j, d), np.float32),
            "descriptors1": jnp.asarray(rng.randn(b, j, d), np.float32),
            "keypoint_scores0": jnp.ones((b, j)),
            "keypoint_scores1": jnp.ones((b, j)),
            "lines0": jnp.asarray(lines),
            "lines1": jnp.asarray(lines),
            "line_scores0": jnp.ones((b, L)),
            "line_scores1": jnp.ones((b, L)),
            "lines_junc_idx0": jnp.broadcast_to(
                jnp.arange(2 * L).reshape(1, L, 2), (b, L, 2)
            ),
            "lines_junc_idx1": jnp.broadcast_to(
                jnp.arange(2 * L).reshape(1, L, 2), (b, L, 2)
            ),
            "view0": {"image_size": jnp.asarray([[240.0, 200.0]] * b)},
            "view1": {"image_size": jnp.asarray([[240.0, 200.0]] * b)},
        }
        return data

    def test_forward_shapes(self, rng):
        model = get_model("gluestick").from_conf(
            {"descriptor_dim": 32, "input_dim": 32, "n_gnn_layers": 2}
        )
        data = self.make_data(rng)
        params = model.init(jax.random.PRNGKey(0), data)
        pred = model.apply(params, data)
        assert pred["matches0"].shape == (1, 24)
        assert pred["line_matches0"].shape == (1, 6)
        assert pred["log_assignment"].shape == (1, 25, 25)
        assert pred["line_log_assignment"].shape == (1, 7, 7)

    def test_symmetric_on_identical_inputs(self, rng):
        """Identical inputs on both sides must produce a symmetric assignment
        (desc0 == desc1 through every self/cross/line layer)."""
        model = get_model("gluestick").from_conf(
            {"descriptor_dim": 32, "input_dim": 32, "n_gnn_layers": 2,
             "filter_threshold": 0.0}
        )
        data = self.make_data(rng)
        data["descriptors1"] = data["descriptors0"]  # truly identical sides
        params = model.init(jax.random.PRNGKey(0), data)
        pred = model.apply(params, data)
        la = np.asarray(pred["log_assignment"][0, :-1, :-1])
        np.testing.assert_allclose(la, la.T, atol=1e-3)

    def test_overfit_loss_decreases(self, rng):
        import optax

        from gluefactory_tpu.geometry.gt_generation import (
            gt_line_matches_from_homography,
            gt_matches_from_homography,
        )

        model = get_model("gluestick").from_conf(
            {"descriptor_dim": 32, "input_dim": 32, "n_gnn_layers": 1,
             "is_training": True}
        )
        rng2 = np.random.RandomState(1)
        data = self.make_data(rng, b=2)
        # perturb side-1 descriptors so the problem is nontrivial
        data["descriptors1"] = data["descriptors0"] + 0.1 * jnp.asarray(
            rng2.randn(2, 24, 32), np.float32
        )
        H = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        gt = gt_matches_from_homography(data["keypoints0"], data["keypoints1"], H)
        gt_l = gt_line_matches_from_homography(data["lines0"], data["lines1"], H)
        data.update(
            {
                "gt_assignment": gt["assignment"],
                "gt_matches0": gt["matches0"],
                "gt_matches1": gt["matches1"],
                "gt_line_assignment": gt_l["line_assignment"],
                "gt_line_matches0": gt_l["line_matches0"],
                "gt_line_matches1": gt_l["line_matches1"],
            }
        )
        params = model.init(jax.random.PRNGKey(0), data)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                pred = model.apply(p, data)
                losses, _ = model.apply(p, pred, data, method="loss")
                return losses["total"].mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(15):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.2, losses

    def test_loss_runs(self, rng):
        from gluefactory_tpu.geometry.gt_generation import (
            gt_line_matches_from_homography,
            gt_matches_from_homography,
        )

        model = get_model("gluestick").from_conf(
            {"descriptor_dim": 32, "input_dim": 32, "n_gnn_layers": 1,
             "is_training": True}
        )
        data = self.make_data(rng, b=2)
        H = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        gt = gt_matches_from_homography(data["keypoints0"], data["keypoints1"], H)
        gt_l = gt_line_matches_from_homography(data["lines0"], data["lines1"], H)
        data.update(
            {
                "gt_assignment": gt["assignment"],
                "gt_matches0": gt["matches0"],
                "gt_matches1": gt["matches1"],
                "gt_line_assignment": gt_l["line_assignment"],
                "gt_line_matches0": gt_l["line_matches0"],
                "gt_line_matches1": gt_l["line_matches1"],
            }
        )
        params = model.init(jax.random.PRNGKey(0), data)
        pred = model.apply(params, data)
        losses, _ = model.apply(params, pred, data, method="loss")
        assert np.isfinite(float(losses["total"].mean()))
        assert "line_assignment_nll" in losses


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
