"""MegaDepth loader test with a fabricated mini-scene in the reference's
on-disk schema (scene_info npz + images + h5 depth), rendered by the
synthetic multi-plane engine so geometry is exact."""

from pathlib import Path

import cv2
import h5py
import numpy as np
import pytest

import gluefactory_tpu.settings as settings
from gluefactory_tpu.datasets.synthetic_two_view import (
    generate_texture_image,
    render_view,
)
from gluefactory_tpu.geometry.utils import so3exp_map


@pytest.fixture(scope="module")
def mini_megadepth(tmp_path_factory):
    root = tmp_path_factory.mktemp("md_data")
    scene = "0000"
    w, h = 320, 240
    f = 300.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    rng = np.random.RandomState(0)
    planes = [(generate_texture_image(rng, (1024, 1024)), 7.0, None)]
    for _ in range(3):
        d = 3.0 + rng.rand() * 2
        cx, cy = rng.uniform(-1, 1, 2)
        planes.append(
            (generate_texture_image(rng, (512, 512)), d, (cx - 0.8, cy - 0.6, cx + 0.8, cy + 0.6))
        )
    planes.sort(key=lambda p: -p[1])

    n_img = 4
    image_paths, depth_paths, poses, intrinsics = [], [], [], []
    (root / "megadepth" / "imgs" / scene).mkdir(parents=True)
    (root / "megadepth" / "depths" / scene).mkdir(parents=True)
    (root / "megadepth" / "scene_info").mkdir(parents=True)
    for i in range(n_img):
        aa = rng.randn(3) * 0.04
        R = np.asarray(so3exp_map(aa.astype(np.float32))).astype(np.float64)
        t = rng.randn(3) * 0.25
        img, depth, _ = render_view(K, R, t, planes, (w, h))
        ip = f"imgs/{scene}/{i}.jpg"
        dp = f"depths/{scene}/{i}.h5"
        cv2.imwrite(str(root / "megadepth" / ip), (img[..., 0] * 255).astype(np.uint8))
        with h5py.File(str(root / "megadepth" / dp), "w") as hf:
            hf.create_dataset("/depth", data=depth)
        image_paths.append(ip)
        depth_paths.append(dp)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T.astype(np.float32))
        intrinsics.append(K.astype(np.float32))

    overlap = np.ones((n_img, n_img), np.float32) * 0.6
    np.fill_diagonal(overlap, 0.0)
    np.savez(
        root / "megadepth" / "scene_info" / f"{scene}.npz",
        image_paths=np.array(image_paths, object),
        depth_paths=np.array(depth_paths, object),
        poses=np.array(poses),
        intrinsics=np.array(intrinsics),
        overlap_matrix=overlap,
    )
    return root


class TestMegaDepthLoader:
    def test_pairs_and_geometry(self, mini_megadepth, monkeypatch):
        import gluefactory_tpu.datasets.megadepth as md

        monkeypatch.setattr(md, "DATA_PATH", mini_megadepth)
        from gluefactory_tpu.datasets.megadepth import MegaDepth

        ds = MegaDepth(
            {
                "data_dir": "megadepth",
                "info_dir": "scene_info/",
                "train_split": None,
                "train_num_per_scene": 6,
                "grayscale": True,
                "min_overlap": 0.3,
                "preprocessing": {"resize": None},
                "train_batch_size": 2,
            }
        )
        data = ds.get_dataset("train")
        assert len(data) > 0
        sample = data[0]
        assert sample["view0"]["image"].shape == (240, 320, 1)
        assert sample["view0"]["depth"].shape == (240, 320)

        # pose+depth GT on the fabricated scene finds consistent matches
        import jax
        import jax.numpy as jnp

        from gluefactory_tpu.geometry.gt_generation import gt_matches_from_pose_depth

        rng = np.random.RandomState(0)
        kp = rng.uniform(20, [300, 220], (1, 200, 2)).astype(np.float32)
        gdata = {
            "view0": {
                "camera": sample["view0"]["camera"],
                "depth": jnp.asarray(sample["view0"]["depth"][None]),
            },
            "view1": {
                "camera": sample["view1"]["camera"],
                "depth": jnp.asarray(sample["view1"]["depth"][None]),
            },
            "T_0to1": jax.tree.map(
                lambda x: x[None] if hasattr(x, "shape") else x, sample["T_0to1"]
            ),
            "T_1to0": jax.tree.map(
                lambda x: x[None] if hasattr(x, "shape") else x, sample["T_1to0"]
            ),
        }
        out = gt_matches_from_pose_depth(jnp.asarray(kp), jnp.asarray(kp), gdata, cc_th=5.0)
        vis = np.asarray(out["visible0"][0])
        assert vis.sum() > 100  # most reprojections land and are cc-consistent

        # epoch resampling changes the pair set
        items_before = list(data.items)
        ds.sample_new_items(123)
        assert data.items != items_before or len(data.items) == len(items_before)

    def test_triplets(self, mini_megadepth, monkeypatch):
        """views=3 samples triplets with all six relative poses
        (reference megadepth.py:367-463)."""
        import gluefactory_tpu.datasets.megadepth as md

        monkeypatch.setattr(md, "DATA_PATH", mini_megadepth)
        from gluefactory_tpu.datasets.megadepth import MegaDepth

        ds = MegaDepth(
            {
                "data_dir": "megadepth",
                "train_split": None,
                "train_num_per_scene": 4,
                "views": 3,
                "grayscale": True,
                "min_overlap": 0.3,
                "preprocessing": {"resize": None},
                "train_batch_size": 2,
            }
        )
        sample = ds.get_dataset("train")[0]
        for n in range(3):
            assert sample[f"view{n}"]["image"].shape == (240, 320, 1)
        # composition consistency: T_0to2 == T_1to2 @ T_0to1
        comp = sample["T_1to2"] @ sample["T_0to1"]
        np.testing.assert_allclose(
            np.asarray(comp.R), np.asarray(sample["T_0to2"].R), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(comp.t), np.asarray(sample["T_0to2"].t), atol=1e-5
        )
        assert 0.3 < sample["overlap_0to1"] <= 1.0

    def test_cached_features(self, mini_megadepth, monkeypatch):
        """load_features mode: views carry padded cached features
        (reference datasets/megadepth.py:311-329)."""
        import gluefactory_tpu.datasets.megadepth as md
        import gluefactory_tpu.models.cache_loader as cl

        monkeypatch.setattr(md, "DATA_PATH", mini_megadepth)
        monkeypatch.setattr(cl, "DATA_PATH", mini_megadepth)
        from gluefactory_tpu.datasets.megadepth import MegaDepth

        # fabricate a per-scene feature cache keyed by image path
        scene = "0000"
        rng = np.random.RandomState(3)
        export = mini_megadepth / "exports"
        export.mkdir(exist_ok=True)
        with h5py.File(str(export / f"{scene}.h5"), "w") as hf:
            for i in range(4):
                g = hf.create_group(f"imgs/{scene}/{i}.jpg")
                n = 30 + i
                g["keypoints"] = rng.uniform(0, 200, (n, 2)).astype(np.float32)
                g["keypoint_scores"] = rng.rand(n).astype(np.float32)
                g["descriptors"] = rng.randn(n, 16).astype(np.float32)

        ds = MegaDepth(
            {
                "data_dir": "megadepth",
                "train_split": None,
                "train_num_per_scene": 4,
                "grayscale": True,
                "preprocessing": {"resize": None},
                "train_batch_size": 2,
                "load_features": {
                    "do": True,
                    "path": "exports/{scene}.h5",
                    "padding_length": 64,
                },
            }
        )
        sample = ds.get_dataset("train")[0]
        for view in (sample["view0"], sample["view1"]):
            cache = view["cache"]
            assert cache["keypoints"].shape == (64, 2)
            assert cache["descriptors"].shape == (64, 16)
            assert cache["keypoint_mask"].sum() >= 30
        # batches stack the cache dicts
        batch = next(iter(ds.get_data_loader("train")))
        assert batch["view0"]["cache"]["keypoints"].shape == (2, 64, 2)

    def test_loader_batching(self, mini_megadepth, monkeypatch):
        import gluefactory_tpu.datasets.megadepth as md

        monkeypatch.setattr(md, "DATA_PATH", mini_megadepth)
        from gluefactory_tpu.datasets.megadepth import MegaDepth

        ds = MegaDepth(
            {
                "data_dir": "megadepth",
                "train_split": None,
                "train_num_per_scene": 4,
                "grayscale": True,
                "preprocessing": {"resize": None},
                "train_batch_size": 2,
            }
        )
        batch = next(iter(ds.get_data_loader("train")))
        assert batch["view0"]["image"].shape[0] == 2
        assert batch["T_0to1"].R.shape == (2, 3, 3)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
