"""Stage 3 of the hermetic detector->matcher quality loop (VERDICT r2 #3).

Builds a synthetic HPatches-layout tree (the reference's exact disk schema:
hpatches-sequences-release/<scene>/{1..6}.ppm + H_1_{2..6}) and runs the real
HPatches benchmark pipeline on:

  a) trained SP-open  + trained LightGlue   (experiment sp_open_lg)
  b) trained SP-open  + mutual-NN           (same detector, matcher ablation)

The chain (stages 1+2 documented in the configs):
  python -m gluefactory_tpu.train sp_open_synth \
      --conf gluefactory_tpu/configs/superpoint-open_synthetic_pretrain.yaml
  python -m gluefactory_tpu.train sp_open_lg \
      --conf gluefactory_tpu/configs/superpoint-open-trained+lightglue_homography.yaml
  python scripts/hermetic_quality_loop.py

Results land in docs/hermetic_quality_loop.md (run with --write).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import cv2
import numpy as np


def build_tree(root: Path, n_scenes=4, seed=0):
    rng = np.random.RandomState(seed)
    tree = root / "hpatches-sequences-release"

    def texture(h, w):
        img = rng.uniform(0.2, 0.8, (h // 8, w // 8)).astype(np.float32)
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
        for _ in range(150):
            x, y = rng.randint(5, w - 25), rng.randint(5, h - 25)
            sw, sh = rng.randint(6, 24), rng.randint(6, 24)
            img[y : y + sh, x : x + sw] = rng.uniform(0, 1)
        img = cv2.GaussianBlur(img, (3, 3), 0.8)
        return np.repeat(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)[..., None], 3, -1
        )

    for si in range(n_scenes):
        kind = "i" if si % 2 == 0 else "v"
        h, w = 480, 640
        sdir = tree / f"{kind}_loop{si}"
        sdir.mkdir(parents=True, exist_ok=True)
        base = texture(h, w)
        cv2.imwrite(str(sdir / "1.ppm"), base)
        for i in range(2, 7):
            if kind == "i":
                H = np.eye(3)
                gain, bias = rng.uniform(0.6, 1.4), rng.uniform(-25, 25)
                img = np.clip(base.astype(np.float32) * gain + bias, 0, 255)
                img = img.astype(np.uint8)
            else:
                src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
                jit = (rng.uniform(-0.1, 0.1, (4, 2)) * [w, h]).astype(np.float32)
                H = cv2.getPerspectiveTransform(src, src + jit)
                img = cv2.warpPerspective(base, H, (w, h))
            cv2.imwrite(str(sdir / f"{i}.ppm"), img)
            np.savetxt(sdir / f"H_1_{i}", H)
    return tree


def main():
    import gluefactory_tpu.datasets.hpatches as hp_mod
    from gluefactory_tpu.eval.hpatches import HPatchesPipeline

    work = Path("outputs/hermetic_loop")
    work.mkdir(parents=True, exist_ok=True)
    data_root = work / "data"
    build_tree(data_root)
    hp_mod.DATA_PATH = data_root

    common_data = {
        "preprocessing": {"resize": 480, "side": "short", "pad_to": [864, 480]}
    }
    extractor = {
        "name": "superpoint_open",
        "max_num_keypoints": 512,
        "detection_threshold": 0.005,
        "dtype": None,
    }
    runs = {
        "trained_sp+trained_lg": {
            "data": common_data,
            "model": {
                "extractor": extractor,
                "matcher": {"name": "lightglue", "filter_threshold": 0.1,  # reference default (r4 calibrated chain works here)
                            "collect_layers": False},
                "checkpoint": "sp_open_lg",
            },
            "eval": {"ransac_th": -1},
        },
        "trained_sp+NN": {
            "data": common_data,
            "model": {
                "extractor": extractor,
                "matcher": {"name": "nearest_neighbor_matcher",
                            "mutual_check": True},
                "checkpoint": "sp_open_lg",
            },
            "eval": {"ransac_th": -1},
        },
    }
    all_s = {}
    for name, conf in runs.items():
        out = work / name
        pipe = HPatchesPipeline(conf)
        summaries, _, _ = pipe.run(Path(out), overwrite=True, overwrite_eval=True)
        all_s[name] = summaries
        keys = ("mprec@3px", "mnum_matches", "mH_error_ransac",
                "H_error_ransac@3px", "mH_error_dlt", "mransac_inl%")
        print(name, {k: summaries.get(k) for k in keys}, flush=True)

    if "--write" in sys.argv:
        doc = Path("docs/hermetic_quality_loop.md")
        lines = [
            "# Hermetic detector->matcher quality loop (round 3)",
            "",
            "Zero-egress BASELINE analogue: no real weights or datasets can",
            "enter this environment, so the loop trains everything from",
            "scratch and evaluates on the reference's exact HPatches disk",
            "schema (synthetic scenes, illumination + viewpoint splits).",
            "",
            "## Chain",
            "",
            "```",
            "python -m gluefactory_tpu.train sp_open_synth \\",
            "    --conf gluefactory_tpu/configs/superpoint-open_synthetic_pretrain.yaml",
            "python -m gluefactory_tpu.train sp_open_lg \\",
            "    --conf gluefactory_tpu/configs/superpoint-open-trained+lightglue_homography.yaml",
            "python scripts/hermetic_quality_loop.py --write",
            "```",
            "",
            "Stage 1 (SyntheticShapes warped pairs, 6 epochs / 3072 iters,",
            "~10 min on one v5e chip): loss 8.2 -> 0.86; held-out shapes:",
            "67% of GT corners detected within 3 px (median 1.6 px).",
            "Stage 2 (LightGlue on the frozen trained detector, homography",
            "recipe, 10 epochs / 2560 iters, ~13 min): val nll 2.90.",
            "",
            "## Stage 3: HPatches benchmark (4 scenes x 5 pairs)",
            "",
            "| config | mprec@3px | mnum_matches | mH_err_ransac | H-AUC-proxy@3px |",
            "|---|---|---|---|---|",
        ]
        for name, s in all_s.items():
            lines.append(
                f"| {name} | {s.get('mprec@3px'):.3f} | "
                f"{s.get('mnum_matches'):.1f} | {s.get('mH_error_ransac'):.3f} | "
                f"{s.get('H_error_ransac@3px'):.3f} |"
            )
        lines += [
            "",
            "Floors asserted in tests/test_hermetic_loop.py (armed on the",
            "trained experiments being present).",
        ]
        doc.write_text("\n".join(lines) + "\n")
        print("wrote", doc)


def dump_weights():
    """Export the trained chain as a compact f16 .npz artifact
    (weights/hermetic/sp_open_lg.npz) so the floors test always runs."""
    import numpy as np

    from gluefactory_tpu.scripts.convert_weights import flatten_tree
    from gluefactory_tpu.utils.experiments import (
        get_best_checkpoint,
        load_checkpoint,
    )

    state, _ = load_checkpoint(get_best_checkpoint("sp_open_lg"))
    tree = {"params": state["params"]}
    if state.get("batch_stats"):
        tree["batch_stats"] = state["batch_stats"]
    flat = flatten_tree(tree)
    flat = {
        k: (v.astype(np.float16) if v.dtype == np.float32 else v)
        for k, v in flat.items()
    }
    out = Path("weights/hermetic")
    out.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out / "sp_open_lg.npz", **flat)
    size = (out / "sp_open_lg.npz").stat().st_size / 1e6
    print(f"wrote weights/hermetic/sp_open_lg.npz ({size:.1f} MB)")


if __name__ == "__main__":
    if "--dump-weights" in sys.argv:
        dump_weights()
    else:
        main()
