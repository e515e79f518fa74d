"""Convert public PyTorch checkpoints into gluefactory_tpu parameter trees.

Zero-egress environments cannot download weights, but users with the official
checkpoints on disk can convert them:

    python -m gluefactory_tpu.scripts.convert_weights \
        --kind superpoint --input superpoint_v1.pth --output sp_ml.npz
    python -m gluefactory_tpu.scripts.convert_weights \
        --kind lightglue --input superpoint_lightglue.pth --output lg.npz

Mappings:
  - superpoint (MagicLeap .pth): convXy.weight (OIHW) -> convXy.kernel (HWIO),
    biases copied 1:1 — matches models/extractors/superpoint_magicleap.py.
  - lightglue (official cvg/LightGlue .pth, after the reference's renaming
    shim lightglue.py:423-430): per-layer tensors are STACKED onto the
    leading layer axis of our fused parameter layout
    (models/matchers/lightglue.py setup).
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_superpoint(state: dict) -> dict:
    params = {}
    for name in (
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ):
        w = np.asarray(state[f"{name}.weight"])  # OIHW
        b = np.asarray(state[f"{name}.bias"])
        params[name] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}


def _stack(state, fmt, n, transpose=True):
    ws = [np.asarray(state[fmt.format(i)]) for i in range(n)]
    ws = [w.T if (transpose and w.ndim == 2) else w for w in ws]
    return np.stack(ws)


def convert_lightglue(state: dict, n_layers: int = 9) -> dict:
    """Official LightGlue state dict -> our stacked layout. Assumes upstream
    key names (transformers.{i}.self_attn..., matchability/final_proj under
    log_assignment.{i}, token_confidence.{i}.token.0)."""
    p = {}

    def S(fmt):
        return _stack(state, fmt, n_layers)

    p["self_Wqkv_w"] = S("transformers.{}.self_attn.Wqkv.weight")
    p["self_Wqkv_b"] = np.stack(
        [np.asarray(state[f"transformers.{i}.self_attn.Wqkv.bias"]) for i in range(n_layers)]
    )
    p["self_out_w"] = S("transformers.{}.self_attn.out_proj.weight")
    p["self_out_b"] = np.stack(
        [np.asarray(state[f"transformers.{i}.self_attn.out_proj.bias"]) for i in range(n_layers)]
    )
    for our, theirs in [("self_ffn1", "self_attn.ffn.0"), ("self_ffn2", "self_attn.ffn.3")]:
        p[f"{our}_w"] = S("transformers.{}." + theirs + ".weight")
        p[f"{our}_b"] = np.stack(
            [np.asarray(state[f"transformers.{i}.{theirs}.bias"]) for i in range(n_layers)]
        )
    p["self_ln_scale"] = np.stack(
        [np.asarray(state[f"transformers.{i}.self_attn.ffn.1.weight"]) for i in range(n_layers)]
    )
    p["self_ln_bias"] = np.stack(
        [np.asarray(state[f"transformers.{i}.self_attn.ffn.1.bias"]) for i in range(n_layers)]
    )

    p["cross_qk_w"] = S("transformers.{}.cross_attn.to_qk.weight")
    p["cross_qk_b"] = np.stack(
        [np.asarray(state[f"transformers.{i}.cross_attn.to_qk.bias"]) for i in range(n_layers)]
    )
    p["cross_v_w"] = S("transformers.{}.cross_attn.to_v.weight")
    p["cross_v_b"] = np.stack(
        [np.asarray(state[f"transformers.{i}.cross_attn.to_v.bias"]) for i in range(n_layers)]
    )
    p["cross_out_w"] = S("transformers.{}.cross_attn.to_out.weight")
    p["cross_out_b"] = np.stack(
        [np.asarray(state[f"transformers.{i}.cross_attn.to_out.bias"]) for i in range(n_layers)]
    )
    for our, theirs in [("cross_ffn1", "cross_attn.ffn.0"), ("cross_ffn2", "cross_attn.ffn.3")]:
        p[f"{our}_w"] = S("transformers.{}." + theirs + ".weight")
        p[f"{our}_b"] = np.stack(
            [np.asarray(state[f"transformers.{i}.{theirs}.bias"]) for i in range(n_layers)]
        )
    p["cross_ln_scale"] = np.stack(
        [np.asarray(state[f"transformers.{i}.cross_attn.ffn.1.weight"]) for i in range(n_layers)]
    )
    p["cross_ln_bias"] = np.stack(
        [np.asarray(state[f"transformers.{i}.cross_attn.ffn.1.bias"]) for i in range(n_layers)]
    )

    p["assign_proj_w"] = S("log_assignment.{}.final_proj.weight")
    p["assign_proj_b"] = np.stack(
        [np.asarray(state[f"log_assignment.{i}.final_proj.bias"]) for i in range(n_layers)]
    )
    p["assign_match_w"] = S("log_assignment.{}.matchability.weight")
    p["assign_match_b"] = np.stack(
        [np.asarray(state[f"log_assignment.{i}.matchability.bias"]) for i in range(n_layers)]
    )
    p["conf_head_w"] = _stack(state, "token_confidence.{}.token.0.weight", n_layers - 1)
    p["conf_head_b"] = np.stack(
        [np.asarray(state[f"token_confidence.{i}.token.0.bias"]) for i in range(n_layers - 1)]
    )
    p["posenc_Wr"] = np.asarray(state["posenc.Wr.weight"]).T
    if "input_proj.weight" in state:
        p["input_proj_w"] = np.asarray(state["input_proj.weight"]).T
        p["input_proj_b"] = np.asarray(state["input_proj.bias"])
    if "posenc.condition_modulation.weight" in state:
        p["posenc_cond_w"] = np.asarray(state["posenc.condition_modulation.weight"]).T
        p["posenc_cond_b"] = np.asarray(state["posenc.condition_modulation.bias"])
    return {"params": p}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", choices=["superpoint", "lightglue"], required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--n_layers", type=int, default=9)
    args = parser.parse_args()

    import torch

    state = torch.load(args.input, map_location="cpu")
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}
    if args.kind == "superpoint":
        tree = convert_superpoint(state)
    else:
        # apply the reference's renaming shim (lightglue.py:423-430)
        for i in range(args.n_layers):
            state = {
                k.replace(f"self_attn.{i}", f"transformers.{i}.self_attn"): v
                for k, v in state.items()
            }
            state = {
                k.replace(f"cross_attn.{i}", f"transformers.{i}.cross_attn"): v
                for k, v in state.items()
            }
        tree = convert_lightglue(state, args.n_layers)

    flat = {}

    def flatten(prefix, d):
        for k, v in d.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten(key, v)
            else:
                flat[key] = v

    flatten("", tree)
    np.savez(args.output, **flat)
    print(f"Wrote {len(flat)} arrays to {args.output}")


if __name__ == "__main__":
    main()
