"""SuperGlue tests: OT marginals, forward shapes, mask invariance, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.matchers.superglue import log_optimal_transport
from test_models import make_matching_data


class TestOptimalTransport:
    def test_marginals(self, rng):
        b, m, n = 2, 12, 16
        scores = jnp.asarray(rng.randn(b, m, n), jnp.float32)
        Z = log_optimal_transport(scores, jnp.asarray(1.0), iters=50)
        P = np.asarray(jnp.exp(Z))
        # after the final -norm shift (reference superglue.py:199), each valid
        # keypoint row/column carries unit mass; the dustbin row carries n
        np.testing.assert_allclose(P[:, :m].sum(-1), 1.0, rtol=1e-3)
        np.testing.assert_allclose(P[:, -1].sum(-1), n, rtol=1e-3)
        np.testing.assert_allclose(P[:, :, :n].sum(1), 1.0, rtol=1e-3)

    def test_masked_marginals(self, rng):
        b, m, n = 1, 12, 16
        scores = jnp.asarray(rng.randn(b, m, n), jnp.float32)
        mask0 = jnp.ones((b, m), bool).at[:, 8:].set(False)
        mask1 = jnp.ones((b, n), bool).at[:, 10:].set(False)
        Z = log_optimal_transport(scores, jnp.asarray(1.0), 50, mask0, mask1)
        P = np.asarray(jnp.exp(Z))
        np.testing.assert_allclose(P[:, :8].sum(-1), 1.0, rtol=1e-3)
        # padded rows carry no mass
        assert P[:, 8:m].sum() < 1e-5


class TestSuperGlue:
    def test_forward_and_masks(self, rng):
        model = get_model("superglue").from_conf(
            {"descriptor_dim": 64, "input_dim": 64, "GNN_layers": 2,
             "num_heads": 2, "sinkhorn_iterations": 20}
        )
        data, perm, gt0 = make_matching_data(rng, b=2, n=32, d=64)
        mask = np.ones((2, 32), bool)
        mask[:, 28:] = False
        data["keypoint_mask0"] = jnp.asarray(mask)
        data["keypoint_mask1"] = jnp.asarray(mask)
        params = model.init(jax.random.PRNGKey(0), data)
        pred = model.apply(params, data)
        assert pred["matches0"].shape == (2, 32)
        assert pred["log_assignment"].shape == (2, 33, 33)
        m0 = np.asarray(pred["matches0"])
        assert np.all(m0[:, 28:] == -1)
        assert not np.any((m0 >= 0) & (m0 >= 28))

    def test_overfit_loss_decreases(self, rng):
        import optax

        from gluefactory_tpu.geometry.gt_generation import gt_matches_from_homography

        model = get_model("superglue").from_conf(
            {"descriptor_dim": 64, "input_dim": 64, "GNN_layers": 1,
             "num_heads": 2, "sinkhorn_iterations": 20, "is_training": True}
        )
        data, perm, gt0 = make_matching_data(rng, b=2, n=32, d=64)
        gt = gt_matches_from_homography(
            data["keypoints0"], data["keypoints1"], data["H_0to1"], pos_th=3
        )
        data = {**data, "gt_assignment": gt["assignment"],
                "gt_matches0": gt["matches0"], "gt_matches1": gt["matches1"]}
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


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
