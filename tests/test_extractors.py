"""Tests for the extractor family: MagicLeap SuperPoint, ALIKED, DISK, Mixed,
weight-converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model


def run_extractor(name, conf, rng, size=(64, 64)):
    model = get_model(name).from_conf(conf)
    img = jnp.asarray(rng.rand(1, size[1], size[0], 1), jnp.float32)
    data = {"image": img}
    variables = model.init(jax.random.PRNGKey(0), data)
    return model.apply(variables, data)


class TestSuperPointMagicLeap:
    def test_forward(self, rng):
        pred = run_extractor(
            "superpoint_magicleap",
            {"max_num_keypoints": 64, "detection_threshold": 0.0},
            rng,
        )
        assert pred["keypoints"].shape == (1, 64, 2)
        assert pred["descriptors"].shape == (1, 64, 256)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pred["descriptors"]), axis=-1), 1.0, atol=1e-4
        )

    def test_weight_converter_roundtrip(self, rng):
        """Fabricate a torch-style state dict, convert, load into the model:
        the mapping must produce the same outputs as manual assignment."""
        import torch

        from gluefactory_tpu.scripts.convert_weights import convert_superpoint

        model = get_model("superpoint_magicleap").from_conf(
            {"max_num_keypoints": 32, "detection_threshold": 0.0}
        )
        img = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), {"image": img})

        # build a fake torch state dict with the official layer names/shapes
        state = {}
        for name, p in variables["params"].items():
            w = np.asarray(p["kernel"])  # HWIO
            state[f"{name}.weight"] = torch.tensor(w.transpose(3, 2, 0, 1))
            state[f"{name}.bias"] = torch.tensor(np.asarray(p["bias"]))
        converted = convert_superpoint(
            {k: v.numpy() for k, v in state.items()}
        )
        out_ref = model.apply(variables, {"image": img})
        out_conv = model.apply(
            {"params": jax.tree.map(jnp.asarray, converted["params"])}, {"image": img}
        )
        np.testing.assert_allclose(
            out_ref["keypoint_scores"], out_conv["keypoint_scores"], atol=1e-6
        )


class TestALIKED:
    def test_forward(self, rng):
        pred = run_extractor(
            "aliked",
            {"max_num_keypoints": 48, "detection_threshold": 0.0,
             "channels": [8, 16, 16, 32], "descriptor_dim": 32, "sddh_M": 4},
            rng,
        )
        assert pred["keypoints"].shape == (1, 48, 2)
        assert pred["descriptors"].shape == (1, 48, 32)
        assert pred["score_map"].shape == (1, 64, 64)
        kp = np.asarray(pred["keypoints"][0])
        assert kp.min() >= -3 and kp.max() <= 67  # sub-pixel refinement stays local


class TestDISK:
    def test_forward(self, rng):
        pred = run_extractor(
            "disk",
            {"max_num_keypoints": 48, "channels": [8, 16, 16], "descriptor_dim": 32},
            rng,
        )
        assert pred["keypoints"].shape == (1, 48, 2)
        assert pred["descriptors"].shape == (1, 48, 32)
        assert pred["heatmap"].shape == (1, 64, 64)


class TestMixed:
    def test_detector_plus_descriptor(self, rng):
        model = get_model("mixed").from_conf(
            {
                "detector": {"name": "superpoint_open", "max_num_keypoints": 32,
                              "detection_threshold": 0.0,
                              "channels": [8, 8, 16, 16, 32], "descriptor_dim": 16},
                "descriptor": {"name": "disk", "max_num_keypoints": 8,
                                "channels": [8, 16, 16], "descriptor_dim": 48},
                "interpolate_descriptors_from": "heatmap_unused_falls_back",
            }
        )
        img = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), {"image": img})
        pred = model.apply(variables, {"image": img})
        assert pred["keypoints"].shape == (1, 32, 2)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
