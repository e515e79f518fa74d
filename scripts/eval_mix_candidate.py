"""A/B the --mix curriculum candidate against the committed hermetic
artifact and the same-detector NN baseline, at the reference-default
filter_threshold 0.1, on the 16-scene/80-pair ramped HPatches fixture
(VERDICT r4 next #2: the 0.1 row must beat NN on every column).

Also measures ORGANIC width pruning (VERDICT r4 next #5): the fraction of
tokens the matchability keep-rule retains on low-overlap pairs, per artifact.

Run on CPU or TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/eval_mix_candidate.py \
        [--candidate sp_open_lg_mix.npz] [--small]
"""

import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np


def build_big_tree(root: Path):
    import cv2

    import test_real_schema_benchmarks as trb

    rng = np.random.RandomState(7)
    tree = root / "hpatches-sequences-release"
    odd_shapes = {2: (420, 700), 5: (384, 560)}
    for k in range(8):
        h, w = odd_shapes.get(k, (480, 640))
        for kind in ("i", "v"):
            scene = f"{kind}_r{k}"
            sdir = tree / scene
            sdir.mkdir(parents=True, exist_ok=True)
            base = trb._texture(rng, h, w)
            cv2.imwrite(str(sdir / "1.ppm"), base)
            for i in range(2, 7):
                if kind == "i":
                    H = np.eye(3)
                    gain = rng.uniform(1 - 0.05 * (k + 1), 1 + 0.05 * (k + 1))
                    bias = rng.uniform(-4 * (k + 1), 4 * (k + 1))
                    img = base.astype(np.float32) * gain + bias
                    if k >= 2:
                        img += rng.normal(0, 0.7 * k, img.shape)
                    if k >= 4:
                        img = np.clip(img, 0, 255)
                        img = 255.0 * (img / 255.0) ** rng.uniform(0.8, 1.25)
                    warped = np.clip(img, 0, 255).astype(np.uint8)
                else:
                    H = trb._random_homography(rng, h, w, mag=0.02 + 0.02 * k)
                    warped = cv2.warpPerspective(
                        base, H, (w, h), flags=cv2.INTER_LINEAR
                    )
                cv2.imwrite(str(sdir / f"{i}.ppm"), warped)
                np.savetxt(sdir / f"H_1_{i}", H)
    return root


def run_chain(data_dir, out_root, weights, with_nn=False):
    import test_real_schema_benchmarks as trb

    old = trb.HERMETIC_WEIGHTS
    trb.HERMETIC_WEIGHTS = Path(weights)
    try:
        s_lg, r_lg, s_nn, r_nn = trb._run_hermetic_chain(data_dir, Path(out_root))
        return s_lg, r_lg, s_nn, r_nn
    finally:
        trb.HERMETIC_WEIGHTS = old


KEYS = ("mprec@3px", "mnum_matches", "H_error_ransac@3px", "H_error_dlt@3px",
        "mH_error_dlt", "mH_error_ransac")


def row(name, s):
    vals = {k: round(float(s.get(k, float("nan"))), 3) for k in KEYS}
    print(f"{name:24s} {vals}")
    return vals


def pruning_probe(weights):
    """Organic width-pruning rate: run the adaptive matcher on low-overlap
    synthetic pairs and report the retained-token fraction per layer."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.datasets import get_dataset

    # low-overlap pairs: difficulty 0.8 like the r4 measurement
    conf = {
        "name": "homographies",
        "synthetic": {"do": True, "pool": 8},
        "train_size": 8, "val_size": 8, "val_batch_size": 4, "num_workers": 0,
        "homography": {"difficulty": 0.8, "translation": 0.8,
                       "patch_shape": [480, 368], "max_angle": 45},
    }
    ds = get_dataset("homographies")(conf)
    loader = ds.get_data_loader("val")
    from gluefactory_tpu.models import get_model

    extractor = get_model("superpoint_open").from_conf(
        {"max_num_keypoints": 512, "detection_threshold": 0.005, "dtype": None}
    )
    from gluefactory_tpu.models.matchers.lightglue_pretrained import (
        load_npz_params,
    )

    restored = load_npz_params(weights)
    restored = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float16 else x,
        restored,
    )
    ext_vars = {
        "params": restored["params"]["extractor"],
        **({"batch_stats": restored["batch_stats"]["extractor"]}
           if restored.get("batch_stats") else {}),
    }
    matcher = get_model("lightglue").from_conf(
        {"filter_threshold": 0.1, "width_confidence": 0.99,
         "depth_confidence": -1, "collect_layers": False}
    )
    m_vars = {"params": restored["params"]["matcher"]}

    rates = []
    for batch in loader:
        for v in ("view0", "view1"):
            img = jnp.asarray(np.asarray(batch[v]["image"]))
            pred = extractor.apply(ext_vars, {"image": img})
            batch[v] = {**{k: jnp.asarray(np.asarray(t))
                           for k, t in batch[v].items()}, "cache": pred}
        data = {
            **{f"{k}0": batch["view0"]["cache"][k] for k in
               ("keypoints", "descriptors")},
            **{f"{k}1": batch["view1"]["cache"][k] for k in
               ("keypoints", "descriptors")},
            "keypoint_mask0": batch["view0"]["cache"]["keypoint_mask"],
            "keypoint_mask1": batch["view1"]["cache"]["keypoint_mask"],
            "view0": {"image_size": batch["view0"]["image_size"]},
            "view1": {"image_size": batch["view1"]["image_size"]},
        }
        out = matcher.apply(m_vars, data)
        # prune0 counts layers each token stayed active; tokens pruned
        # before exit have prune < n_layers
        p0 = np.asarray(out["prune0"])
        mask0 = np.asarray(data["keypoint_mask0"])
        n_layers = 9
        retained = (p0[mask0] >= n_layers).mean()
        rates.append(retained)
        break
    return float(np.mean(rates))


def main():
    cand = "sp_open_lg_mix.npz"
    if "--candidate" in sys.argv:
        cand = sys.argv[sys.argv.index("--candidate") + 1]
    cand = REPO / "weights" / "hermetic" / cand
    committed = REPO / "weights" / "hermetic" / "sp_open_lg.npz"

    work = Path(tempfile.mkdtemp(prefix="mix_ab_"))
    data_dir = work / "data"
    build_big_tree(data_dir)

    print("== 16-scene / 80-pair ramped fixture, filter_threshold 0.1 ==")
    s_lg_c, r_c, s_nn, _ = run_chain(data_dir, work / "committed", committed)
    row("committed LG @0.1", s_lg_c)
    row("NN baseline", s_nn)
    s_lg_m, r_m, _, _ = run_chain(data_dir, work / "mix", cand)
    row("mix-candidate LG @0.1", s_lg_m)

    print("\n== organic width pruning (difficulty-0.8 pairs, keep-rate) ==")
    print("committed :", pruning_probe(committed))
    print("candidate :", pruning_probe(cand))


if __name__ == "__main__":
    main()
