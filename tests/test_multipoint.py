"""Multispectral (multipoint) stack tests: MultiPoint/XPoint forward, losses,
homographic adaptation, MP dataset bridge, detector metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.multipoint.utils.evaluation import (
    keypoints_from_prob,
    repeatability,
)
from gluefactory_tpu.multipoint.utils.losses import (
    descriptor_loss,
    detector_loss,
    space_to_depth,
)


class TestMultiPoint:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = get_model("gluefactory_tpu.multipoint.models.multipoint").from_conf(
            {"channels": [8, 8, 16, 16], "head_channels": 32,
             "descriptor_size": 32, "max_num_keypoints": 32}
        )
        img = jnp.zeros((2, 64, 64, 1))
        data = {"image": img, "is_optical": jnp.asarray([True, False])}
        params = model.init(jax.random.PRNGKey(0), data)
        return model, params

    def test_forward_shapes(self, model_and_params, rng):
        model, params = model_and_params
        img = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
        pred = model.apply(
            params, {"image": img, "is_optical": jnp.asarray([True, False])}
        )
        assert pred["logits"].shape == (2, 8, 8, 65)
        assert pred["prob"].shape == (2, 64, 64)
        assert pred["dense_descriptors"].shape == (2, 8, 8, 32)
        assert pred["keypoints"].shape == (2, 32, 2)

    def test_modality_routing(self, model_and_params, rng):
        """Optical and thermal encoders differ -> routing changes the output."""
        model, params = model_and_params
        img = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
        p_opt = model.apply(params, {"image": img, "is_optical": jnp.asarray([True])})
        p_thm = model.apply(params, {"image": img, "is_optical": jnp.asarray([False])})
        assert not np.allclose(np.asarray(p_opt["prob"]), np.asarray(p_thm["prob"]))


class TestXPoint:
    def test_forward(self, rng):
        model = get_model("gluefactory_tpu.multipoint.models.xpoint").from_conf(
            {"backbone_dim": 32, "backbone_depth": 2, "head_channels": 32,
             "descriptor_size": 32, "window": 4}
        )
        img = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
        data = {"image": img, "is_optical": jnp.asarray([True])}
        params = model.init(jax.random.PRNGKey(0), data)
        pred = model.apply(params, data)
        assert pred["prob"].shape == (1, 64, 64)
        assert pred["dense_descriptors"].shape == (1, 8, 8, 32)


class TestSuperPointLoss:
    def test_space_to_depth_roundtrip(self, rng):
        x = (rng.rand(2, 16, 24) > 0.9).astype(np.float32)
        cells = np.asarray(space_to_depth(jnp.asarray(x), 8))
        assert cells.shape == (2, 2, 3, 64)
        assert cells.sum() == x.sum()

    def test_detector_loss_supervised(self, rng):
        """CE decreases when logits match the keypoint map."""
        kp_map = (rng.rand(1, 32, 32) > 0.97).astype(np.float32)
        cells = np.asarray(space_to_depth(jnp.asarray(kp_map), 8))  # (1,4,4,64)
        labels = np.concatenate([cells * 2, np.ones((1, 4, 4, 1)) * 0.5], -1).argmax(-1)
        good = jnp.asarray(np.eye(65)[labels] * 10.0, jnp.float32)
        bad = jnp.asarray(rng.randn(1, 4, 4, 65), jnp.float32)
        l_good = float(detector_loss(good, jnp.asarray(kp_map)).mean())
        l_bad = float(detector_loss(bad, jnp.asarray(kp_map)).mean())
        assert l_good < l_bad

    def test_descriptor_loss_prefers_aligned(self, rng):
        d = 16
        desc = rng.randn(1, 4, 4, d).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        H = jnp.eye(3)[None]
        # identical descriptors under identity H -> low loss
        l_same, pd, nd = descriptor_loss(jnp.asarray(desc), jnp.asarray(desc), H)
        perm = desc[:, ::-1, ::-1]
        l_perm, *_ = descriptor_loss(jnp.asarray(desc), jnp.asarray(perm), H)
        assert float(l_same.mean()) < float(l_perm.mean())
        assert float(pd.mean()) > float(nd.mean())


class TestHomographicAdaptation:
    def test_aggregation_sharpens_consistent_detector(self, rng):
        from gluefactory_tpu.multipoint.utils.homographies import (
            homographic_adaptation,
        )

        # a fake detector that fires on a fixed image structure: bright blobs
        base = np.zeros((1, 64, 64, 1), np.float32)
        for x, y in [(16, 16), (48, 20), (30, 45)]:
            base[0, y - 1 : y + 2, x - 1 : x + 2, 0] = 1.0

        def prob_fn(img):
            return jnp.clip(img[..., 0], 0, 1)

        agg = homographic_adaptation(
            prob_fn, jnp.asarray(base), num=8, rng=np.random.RandomState(0),
            hconf={"difficulty": 0.2, "translation": 0.1, "max_angle": 10},
        )
        agg = np.asarray(agg)
        assert agg.shape == (1, 64, 64)
        # structure is preserved near blobs and stays low elsewhere
        assert agg[0, 15:18, 15:18].max() > 0.3
        assert agg[0, 55:, 55:].max() < 0.15


class TestMPDatasetBridge:
    def test_bridge_format_and_eval_metrics(self, rng):
        from gluefactory_tpu.datasets import get_dataset

        ds = get_dataset("mp_image_pairs")(
            {
                "mp": {
                    "synthetic": {"pool": 4, "size": [128, 96]},
                    "augmentation": {
                        "photometric": {"enable": False},
                        "homographic": {
                            "enable": True,
                            "params": {"difficulty": 0.3, "translation": 0.2,
                                        "max_angle": 15},
                        },
                    },
                },
            }
        )
        sample = ds.get_dataset("test")[0]
        assert sample["view0"]["image"].shape == (96, 128, 1)
        assert sample["H_0to1"].shape == (3, 3)
        # the modalities must actually differ (thermal is not optical)
        diff = np.abs(sample["view0"]["image"] - sample["view1"]["image"]).mean()
        assert diff > 0.05

    def test_repeatability_metric(self, rng):
        kpts = rng.uniform(10, 100, (30, 2)).astype(np.float32)
        rep = repeatability(kpts, kpts, np.eye(3), (128, 128), dist_thresh=1.0)
        assert rep == 1.0
        rep2 = repeatability(kpts, kpts + 50.0, np.eye(3), (128, 128), dist_thresh=1.0)
        assert rep2 < 0.5


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
