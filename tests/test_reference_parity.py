"""Parity against the REAL reference torch modules (VERDICT r4 next #3).

`tests/test_convert_weights.py` verifies our converted-JAX forwards against
*hand-written torch replicas* of the reference math — a transcription error in
a replica would go undetected. These tests close that risk class: they import
the ACTUAL reference classes from `/root/reference` (gluefactory /
gluefactory_nonfree) under the in-env CPU torch, load the same fabricated
random state dicts into them, and assert our converted-JAX models reproduce
the real modules' outputs.

`omegaconf` is not installed in this environment, so the reference import
chain (gluefactory/models/base_model.py:8-9) runs against the test-only stub
in `tests/_stubs/omegaconf` — a ~150-LoC implementation of exactly the conf
API surface BaseModel touches (base_model.py:25-129). The stub is inserted
only when no real omegaconf exists and only for the reference import; nothing
in gluefactory_tpu imports omegaconf.

Covered real modules (the ones importable with in-env deps):
  - gluefactory.models.matchers.lightglue.LightGlue   (lightglue.py:340-579)
  - gluefactory_nonfree.superglue.SuperGlue           (superglue.py:208-310)
  - gluefactory.models.matchers.gluestick.GlueStick   (gluestick.py:18-310)
  - gluefactory_nonfree.superpoint.SuperPoint         (superpoint.py:152-330)
ALIKED needs torchvision (deform_conv2d) and DeepLSD/LoFTR/DISK need their
pip packages — none installed; those stay covered by the replica tests.
"""

import sys
from pathlib import Path
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gluefactory_tpu.models import get_model  # noqa: E402
from gluefactory_tpu.scripts.convert_weights import (  # noqa: E402
    convert_gluestick,
    convert_lightglue,
    convert_superglue,
    convert_superpoint,
)

# fabrication helpers shared with the replica tests (same key names/shapes)
from test_convert_weights import (  # noqa: E402
    D,
    H,
    L,
    make_gluestick_state,
    make_lightglue_state,
    make_superglue_state,
)

REFERENCE = Path("/root/reference")
STUBS = Path(__file__).resolve().parent / "_stubs"

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "gluefactory").exists(),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def refmods():
    """Import the real reference modules once; sys.path is restored after the
    imports so the reference tree cannot shadow anything else in the worker
    (the imported modules stay alive in sys.modules)."""
    inserted = []
    try:
        import omegaconf  # noqa: F401
    except ImportError:
        sys.path.insert(0, str(STUBS))
        inserted.append(str(STUBS))
    sys.path.insert(0, str(REFERENCE))
    inserted.append(str(REFERENCE))
    try:
        import gluefactory.models.matchers.gluestick as ref_gs
        import gluefactory.models.matchers.lightglue as ref_lg
        import gluefactory_nonfree.superglue as ref_sg
        import gluefactory_nonfree.superpoint as ref_sp
    finally:
        for p in inserted:
            sys.path.remove(p)
    return {"lightglue": ref_lg, "gluestick": ref_gs,
            "superglue": ref_sg, "superpoint": ref_sp}


def _strict_load(module, sd):
    """strict=False load + assert the fabricated key set IS the module's full
    parameter/buffer set (modulo BN bookkeeping) — catches silent key drift."""
    missing, unexpected = module.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected}"
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    assert not real_missing, f"missing keys: {real_missing}"


# --------------------------------------------------------------------------- #
# LightGlue — the flagship matcher
# --------------------------------------------------------------------------- #


class TestLightGlueRealReference:
    @pytest.mark.parametrize("equal_sets", [True, False], ids=["m==n", "m!=n"])
    def test_real_reference_forward(self, refmods, equal_sets):
        ref_lg = refmods["lightglue"]
        th = 0.05
        rng = np.random.RandomState(7)
        # the fork's LightGlue always uses the Conditional Fourier posenc
        # (lightglue.py:380-381), so fabricate the conditional state
        sd = make_lightglue_state(rng, conditional=True)

        model_t = ref_lg.LightGlue(
            {
                "input_dim": D,
                "descriptor_dim": D,
                "n_layers": L,
                "num_heads": H,
                "weights": None,
                "filter_threshold": th,
                "flash": False,
            }
        )
        _strict_load(model_t, sd)
        model_t.eval()

        b = 2
        m, n = (32, 32) if equal_sets else (40, 32)
        kpts0 = rng.uniform(0, 320, (b, m, 2)).astype(np.float32)
        kpts1 = rng.uniform(0, 320, (b, n, 2)).astype(np.float32)
        desc0 = rng.randn(b, m, D).astype(np.float32)
        desc1 = rng.randn(b, n, D).astype(np.float32)
        size = np.array([[320.0, 240.0]] * b, np.float32)

        with torch.no_grad():
            tp = model_t(
                {
                    "keypoints0": torch.tensor(kpts0),
                    "keypoints1": torch.tensor(kpts1),
                    "descriptors0": torch.tensor(desc0),
                    "descriptors1": torch.tensor(desc1),
                    "view0": {"image_size": torch.tensor(size)},
                    "view1": {"image_size": torch.tensor(size)},
                }
            )

        tree = convert_lightglue(
            {k: v.numpy() for k, v in sd.items()}, n_layers=L, num_heads=H
        )
        model = get_model("lightglue").from_conf(
            {
                "input_dim": D,
                "descriptor_dim": D,
                "n_layers": L,
                "num_heads": H,
                "filter_threshold": th,
                "posenc": "conditional_fourier",
                "flash": False,
            }
        )
        data = {
            "keypoints0": jnp.asarray(kpts0),
            "keypoints1": jnp.asarray(kpts1),
            "descriptors0": jnp.asarray(desc0),
            "descriptors1": jnp.asarray(desc1),
            "view0": {"image_size": jnp.asarray(size)},
            "view1": {"image_size": jnp.asarray(size)},
        }
        variables = model.init(jax.random.PRNGKey(0), data)
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"
        pred = model.apply(got_tree, data)

        np.testing.assert_array_equal(
            np.asarray(pred["matches0"]), tp["matches0"].numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(pred["matches1"]), tp["matches1"].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(pred["matching_scores0"]),
            tp["matching_scores0"].numpy(),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(pred["log_assignment"][:, :-1, :-1]),
            tp["log_assignment"][:, :-1, :-1].numpy(),
            atol=5e-3,
            rtol=2e-3,
        )


# --------------------------------------------------------------------------- #
# SuperGlue (gluefactory_nonfree)
# --------------------------------------------------------------------------- #


class TestSuperGlueRealReference:
    def test_real_reference_forward(self, refmods):
        ref_sg = refmods["superglue"]
        rng = np.random.RandomState(11)
        n_gnn, iters, th = 2, 20, 0.1
        sd = make_superglue_state(rng, kenc_layers=(8, 16), n_gnn=n_gnn)

        model_t = ref_sg.SuperGlue(
            {
                "descriptor_dim": D,
                "weights": None,
                "keypoint_encoder": [8, 16],
                "GNN_layers": ["self", "cross"] * n_gnn,
                "num_sinkhorn_iterations": iters,
                "filter_threshold": th,
                "use_scores": True,
            }
        )
        _strict_load(model_t, sd)
        model_t.eval()

        b, m, n = 2, 24, 30
        kpts0 = rng.uniform(0, 320, (b, m, 2)).astype(np.float32)
        kpts1 = rng.uniform(0, 320, (b, n, 2)).astype(np.float32)
        sc0 = rng.rand(b, m).astype(np.float32)
        sc1 = rng.rand(b, n).astype(np.float32)
        desc0 = rng.randn(b, m, D).astype(np.float32)
        desc1 = rng.randn(b, n, D).astype(np.float32)
        desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
        desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
        size = np.array([[320.0, 240.0]] * b, np.float32)
        img = np.zeros((b, 1, 240, 320), np.float32)  # only .shape is read

        with torch.no_grad():
            tp = model_t(
                {
                    "keypoints0": torch.tensor(kpts0),
                    "keypoints1": torch.tensor(kpts1),
                    "keypoint_scores0": torch.tensor(sc0),
                    "keypoint_scores1": torch.tensor(sc1),
                    "descriptors0": torch.tensor(desc0),
                    "descriptors1": torch.tensor(desc1),
                    "view0": {"image_size": torch.tensor(size),
                              "image": torch.tensor(img)},
                    "view1": {"image_size": torch.tensor(size),
                              "image": torch.tensor(img)},
                }
            )

        tree = convert_superglue({k: v.numpy() for k, v in sd.items()}, n_gnn, H)
        model = get_model("superglue").from_conf(
            {
                "input_dim": D,
                "descriptor_dim": D,
                "keypoint_encoder": [8, 16],
                "GNN_layers": n_gnn,
                "sinkhorn_iterations": iters,
                "filter_threshold": th,
                "ln": False,
            }
        )
        data = {
            "keypoints0": jnp.asarray(kpts0),
            "keypoints1": jnp.asarray(kpts1),
            "keypoint_scores0": jnp.asarray(sc0),
            "keypoint_scores1": jnp.asarray(sc1),
            "descriptors0": jnp.asarray(desc0),
            "descriptors1": jnp.asarray(desc1),
            "view0": {"image_size": jnp.asarray(size)},
            "view1": {"image_size": jnp.asarray(size)},
        }
        variables = model.init(jax.random.PRNGKey(0), data)
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"
        pred = model.apply(got_tree, data)

        np.testing.assert_allclose(
            np.asarray(pred["log_assignment"]),
            tp["log_assignment"].numpy(),
            atol=5e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(pred["matches0"]), tp["matches0"].numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(pred["matches1"]), tp["matches1"].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(pred["matching_scores0"]),
            tp["matching_scores0"].numpy(),
            atol=2e-4,
        )


# --------------------------------------------------------------------------- #
# GlueStick
# --------------------------------------------------------------------------- #


class TestGlueStickRealReference:
    def test_real_reference_forward(self, refmods):
        ref_gs = refmods["gluestick"]
        rng = np.random.RandomState(13)
        n_gnn, th = 2, 0.2
        sd = make_gluestick_state(rng, kenc_layers=(8, 16), n_gnn=n_gnn)

        model_t = ref_gs.GlueStick(
            {
                "input_dim": D,
                "descriptor_dim": D,
                "weights": None,
                "keypoint_encoder": [8, 16],
                "GNN_layers": ["self", "cross"] * n_gnn,
                "filter_threshold": th,
            }
        )
        _strict_load(model_t, sd)
        model_t.eval()

        b, L0, L1 = 2, 5, 6
        m, n = 2 * L0 + 6, 2 * L1 + 4
        kpts0 = rng.uniform(0, 320, (b, m, 2)).astype(np.float32)
        kpts1 = rng.uniform(0, 320, (b, n, 2)).astype(np.float32)
        sc0 = rng.rand(b, m).astype(np.float32)
        sc1 = rng.rand(b, n).astype(np.float32)
        desc0 = rng.randn(b, m, D).astype(np.float32)
        desc1 = rng.randn(b, n, D).astype(np.float32)
        desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
        desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
        lines0 = rng.uniform(0, 320, (b, L0, 2, 2)).astype(np.float32)
        lines1 = rng.uniform(0, 320, (b, L1, 2, 2)).astype(np.float32)
        lsc0 = rng.rand(b, L0).astype(np.float32)
        lsc1 = rng.rand(b, L1).astype(np.float32)
        lj0 = rng.randint(0, 2 * L0, (b, 2 * L0)).astype(np.int64)
        lj1 = rng.randint(0, 2 * L1, (b, 2 * L1)).astype(np.int64)
        size = np.array([[320.0, 240.0]] * b, np.float32)

        with torch.no_grad():
            tp = model_t(
                {
                    "keypoints0": torch.tensor(kpts0),
                    "keypoints1": torch.tensor(kpts1),
                    "keypoint_scores0": torch.tensor(sc0),
                    "keypoint_scores1": torch.tensor(sc1),
                    "descriptors0": torch.tensor(desc0),
                    "descriptors1": torch.tensor(desc1),
                    "lines0": torch.tensor(lines0),
                    "lines1": torch.tensor(lines1),
                    "line_scores0": torch.tensor(lsc0),
                    "line_scores1": torch.tensor(lsc1),
                    # reference takes (B, L, 2) and flattens (gluestick.py:193)
                    "lines_junc_idx0": torch.tensor(lj0.reshape(b, L0, 2)),
                    "lines_junc_idx1": torch.tensor(lj1.reshape(b, L1, 2)),
                    "view0": {"image_size": torch.tensor(size)},
                    "view1": {"image_size": torch.tensor(size)},
                }
            )

        tree = convert_gluestick({k: v.numpy() for k, v in sd.items()}, n_gnn, H)
        model = get_model("gluestick").from_conf(
            {
                "input_dim": D,
                "descriptor_dim": D,
                "keypoint_encoder": [8, 16],
                "n_gnn_layers": n_gnn,
                "filter_threshold": th,
                "ln": False,
                "compat_tiled_line_scores": True,
            }
        )
        data = {
            "keypoints0": jnp.asarray(kpts0),
            "keypoints1": jnp.asarray(kpts1),
            "keypoint_scores0": jnp.asarray(sc0),
            "keypoint_scores1": jnp.asarray(sc1),
            "descriptors0": jnp.asarray(desc0),
            "descriptors1": jnp.asarray(desc1),
            "lines0": jnp.asarray(lines0),
            "lines1": jnp.asarray(lines1),
            "line_scores0": jnp.asarray(lsc0),
            "line_scores1": jnp.asarray(lsc1),
            "lines_junc_idx0": jnp.asarray(lj0),
            "lines_junc_idx1": jnp.asarray(lj1),
            "view0": {"image_size": jnp.asarray(size)},
            "view1": {"image_size": jnp.asarray(size)},
        }
        variables = model.init(jax.random.PRNGKey(0), data)
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"
        pred = model.apply(got_tree, data)

        np.testing.assert_allclose(
            np.asarray(pred["log_assignment"]),
            tp["log_assignment"].numpy(),
            atol=5e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(pred["matches0"]), tp["matches0"].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(pred["matching_scores0"]),
            tp["matching_scores0"].numpy(),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(pred["raw_line_scores"]),
            tp["raw_line_scores"].numpy(),
            atol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(pred["line_log_assignment"]),
            tp["line_log_assignment"].numpy(),
            atol=5e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(pred["line_matches0"]), tp["line_matches0"].numpy()
        )


# --------------------------------------------------------------------------- #
# SuperPoint (gluefactory_nonfree, MagicLeap weights schema)
# --------------------------------------------------------------------------- #


def make_superpoint_state(rng):
    def _t(r, *shape):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        return torch.tensor((r.randn(*shape) / np.sqrt(fan_in)).astype(np.float32))

    names = [
        ("conv1a", 64, 1), ("conv1b", 64, 64), ("conv2a", 64, 64),
        ("conv2b", 64, 64), ("conv3a", 128, 64), ("conv3b", 128, 128),
        ("conv4a", 128, 128), ("conv4b", 128, 128),
        ("convPa", 256, 128), ("convPb", 65, 256),
        ("convDa", 256, 128), ("convDb", 256, 256),
    ]
    sd = {}
    for name, out_c, in_c in names:
        k = 1 if name in ("convPb", "convDb") else 3
        sd[f"{name}.weight"] = _t(rng, out_c, in_c, k, k)
        sd[f"{name}.bias"] = _t(rng, out_c)
    return sd


class TestSuperPointRealReference:
    def test_real_reference_forward(self, refmods):
        """Dense maps + sparse top-k against the real nonfree SuperPoint.
        The reference _init unconditionally fetches the official checkpoint
        (superpoint.py:199-201); the hub loader is patched to return the
        fabricated state instead (zero egress)."""
        ref_sp = refmods["superpoint"]
        rng = np.random.RandomState(5)
        sd = make_superpoint_state(rng)

        with mock.patch.object(
            torch.hub, "load_state_dict_from_url", return_value=sd
        ):
            model_t = ref_sp.SuperPoint(
                {
                    "max_num_keypoints": 48,
                    "detection_threshold": 1e-4,
                    "force_num_keypoints": True,
                    "nms_radius": 4,
                    "dense_outputs": True,
                }
            )
        model_t.eval()

        img = rng.rand(1, 1, 64, 96).astype(np.float32)
        with torch.no_grad():
            tp = model_t({"image": torch.tensor(img)})

        tree = convert_superpoint({k: v.numpy() for k, v in sd.items()})
        model = get_model("superpoint_magicleap").from_conf(
            {
                "max_num_keypoints": 48,
                "detection_threshold": 1e-4,
                "nms_radius": 4,
                "dense_outputs": True,
            }
        )
        jimg = jnp.asarray(img.transpose(0, 2, 3, 1))
        variables = model.init(jax.random.PRNGKey(0), {"image": jimg})
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"
        pred = model.apply(got_tree, {"image": jimg})

        # dense descriptor map: ref NCHW vs ours NHWC (both under
        # dense_outputs; superpoint.py:347-348)
        np.testing.assert_allclose(
            np.asarray(pred["dense_descriptors"]),
            tp["dense_descriptors"].permute(0, 2, 3, 1).numpy(),
            atol=1e-5,
        )

        # sparse keypoints: same (x, y) set with matching scores/descriptors.
        # Both use the pixel-center +0.5 convention (superpoint.py:342); the
        # ORDER can differ (ref sorts by score within threshold survivors;
        # ours is a global top_k), so compare keyed by coordinate. Reference
        # pads to force_num_keypoints with random coords + zero scores
        # (pad_and_stack mode="random_c"), which the score cut excludes.
        ref_kp = tp["keypoints"][0].numpy()
        ref_sc = tp["keypoint_scores"][0].numpy()
        ref_desc = tp["descriptors"][0].numpy()
        our_kp = np.asarray(pred["keypoints"][0])
        our_sc = np.asarray(pred["keypoint_scores"][0])
        our_desc = np.asarray(pred["descriptors"][0])
        our_mask = np.asarray(pred["keypoint_mask"][0])

        ref_valid = {
            (float(x), float(y)): (float(s), d)
            for (x, y), s, d in zip(ref_kp, ref_sc, ref_desc)
            if s > 1e-4
        }
        our_valid = {
            (float(x), float(y)): (float(s), d)
            for (x, y), s, d, mk in zip(our_kp, our_sc, our_desc, our_mask)
            if mk
        }
        assert set(ref_valid) == set(our_valid)
        assert len(ref_valid) > 5, "degenerate test: almost no keypoints"
        for xy, (s_ref, d_ref) in ref_valid.items():
            s_our, d_our = our_valid[xy]
            np.testing.assert_allclose(s_our, s_ref, atol=1e-5)
            np.testing.assert_allclose(d_our, d_ref, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
