"""Official-weights parity loop.

The reference's de-facto correctness contract is pretrained-weight inference
(gluefactory/models/matchers/lightglue.py:400-430 weight loading,
tests/test_integration.py:106-108 floors). Zero egress means no real
checkpoints here, so these tests close the loop hermetically:

 1. utils/torch_io.py reads REAL torch-serialized files (fabricated with the
    in-env torch, both zip and legacy formats) identically to torch.load.
 2. convert_weights mappings are verified NUMERICALLY: a test-local torch
    implementation of the published LightGlue / SuperGlue forward math
    (written from the papers/reference equations, upstream key names and
    tensor packings) is run on a fabricated state dict, and our JAX model
    with the converted parameters must reproduce its matches and scores.
 3. test_official_weight_floors runs the reference integration floors the
    moment real checkpoints are placed under GLUEFACTORY_TPU_WEIGHTS.
"""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gluefactory_tpu.models import get_model
from gluefactory_tpu.scripts.convert_weights import (
    convert_lightglue,
    convert_superglue,
    convert_superpoint,
    flatten_tree,
    rename_lightglue_v01,
)
from gluefactory_tpu.utils import torch_io

# --------------------------------------------------------------------------- #
# 1. torch_io vs torch.load
# --------------------------------------------------------------------------- #


class TestTorchIO:
    @pytest.mark.parametrize("legacy", [False, True], ids=["zip", "legacy"])
    def test_roundtrip_matches_torch(self, legacy):
        g = torch.Generator().manual_seed(0)
        sd = {
            "w": torch.randn(4, 3, generator=g),
            "b": torch.randn(4, generator=g),
            "half": torch.randn(2, 5, generator=g).half(),
            "long": torch.arange(6).reshape(2, 3),
            "bool": torch.tensor([True, False, True]),
            "noncontig": torch.randn(4, 6, generator=g).t(),
            "conv": torch.randn(8, 3, 3, 3, generator=g),
        }
        buf = io.BytesIO()
        torch.save(sd, buf, _use_new_zipfile_serialization=not legacy)
        buf.seek(0)
        out = torch_io.load(buf)
        for k, v in sd.items():
            np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)

    def test_bfloat16(self):
        sd = {"x": torch.randn(3, 3).bfloat16()}
        buf = io.BytesIO()
        torch.save(sd, buf)
        buf.seek(0)
        out = torch_io.load(buf)
        np.testing.assert_array_equal(
            out["x"].astype(np.float32), sd["x"].float().numpy()
        )

    def test_nested_model_key_unwrap(self):
        buf = io.BytesIO()
        torch.save({"model": {"x": torch.ones(2)}, "epoch": 3}, buf)
        buf.seek(0)
        assert list(torch_io.load_state_dict(buf)) == ["x"]

    def test_refuses_arbitrary_globals(self):
        buf = io.BytesIO()
        torch.save({"f": os.getcwd}, buf, pickle_protocol=2)
        buf.seek(0)
        with pytest.raises(Exception, match="refusing|persistent|Unpickling"):
            torch_io.load(buf)


# --------------------------------------------------------------------------- #
# 2. numeric parity: torch reference math vs our converted-JAX forward
# --------------------------------------------------------------------------- #

D, H, L = 64, 4, 3  # descriptor dim, heads, layers (small for test speed)
DH = D // H


def _t(rng, *shape):
    return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.2)


def make_lightglue_state(rng, conditional: bool, v01_names: bool = False):
    """Fabricate a state dict with the exact upstream key names/shapes."""
    sd = {}
    for i in range(L):
        for blk in ("self_attn", "cross_attn"):
            pre = f"{blk}.{i}" if v01_names else f"transformers.{i}.{blk}"
            if blk == "self_attn":
                sd[f"{pre}.Wqkv.weight"] = _t(rng, 3 * D, D)
                sd[f"{pre}.Wqkv.bias"] = _t(rng, 3 * D)
                sd[f"{pre}.out_proj.weight"] = _t(rng, D, D)
                sd[f"{pre}.out_proj.bias"] = _t(rng, D)
            else:
                for nm in ("to_qk", "to_v", "to_out"):
                    sd[f"{pre}.{nm}.weight"] = _t(rng, D, D)
                    sd[f"{pre}.{nm}.bias"] = _t(rng, D)
            sd[f"{pre}.ffn.0.weight"] = _t(rng, 2 * D, 2 * D)
            sd[f"{pre}.ffn.0.bias"] = _t(rng, 2 * D)
            sd[f"{pre}.ffn.1.weight"] = torch.ones(2 * D) + _t(rng, 2 * D) * 0.1
            sd[f"{pre}.ffn.1.bias"] = _t(rng, 2 * D)
            sd[f"{pre}.ffn.3.weight"] = _t(rng, D, 2 * D)
            sd[f"{pre}.ffn.3.bias"] = _t(rng, D)
        sd[f"log_assignment.{i}.final_proj.weight"] = _t(rng, D, D)
        sd[f"log_assignment.{i}.final_proj.bias"] = _t(rng, D)
        sd[f"log_assignment.{i}.matchability.weight"] = _t(rng, 1, D)
        sd[f"log_assignment.{i}.matchability.bias"] = _t(rng, 1)
        if i < L - 1:
            sd[f"token_confidence.{i}.token.0.weight"] = _t(rng, 1, D)
            sd[f"token_confidence.{i}.token.0.bias"] = _t(rng, 1)
    sd["posenc.Wr.weight"] = _t(rng, DH // 2, 2)
    if conditional:
        sd["posenc.condition_modulation.weight"] = _t(rng, DH // 2, 1)
        sd["posenc.condition_modulation.bias"] = _t(rng, DH // 2)
    return sd


# ---- test-local torch reference of the published LightGlue forward math ----


def _tg_rotate_half(x):
    x = x.unflatten(-1, (-1, 2))
    return torch.stack((-x[..., 1], x[..., 0]), dim=-1).flatten(-2)


def _tg_apply_rotary(freqs, t):
    return t * freqs[0] + _tg_rotate_half(t) * freqs[1]


def _tg_norm_kpts(kpts, size):
    shift = size / 2
    scale = size.max(-1).values / 2
    return (kpts - shift[:, None, :]) / scale[:, None, None]


def _tg_ffn(sd, pre, x, msg):
    y = torch.cat([x, msg], -1) @ sd[f"{pre}.ffn.0.weight"].T + sd[f"{pre}.ffn.0.bias"]
    y = torch.nn.functional.layer_norm(
        y, (y.shape[-1],), sd[f"{pre}.ffn.1.weight"], sd[f"{pre}.ffn.1.bias"]
    )
    y = torch.nn.functional.gelu(y)
    return y @ sd[f"{pre}.ffn.3.weight"].T + sd[f"{pre}.ffn.3.bias"]


def _tg_self_block(sd, i, x, enc):
    pre = f"transformers.{i}.self_attn"
    qkv = x @ sd[f"{pre}.Wqkv.weight"].T + sd[f"{pre}.Wqkv.bias"]
    qkv = qkv.unflatten(-1, (H, -1, 3)).transpose(1, 2)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    q, k = _tg_apply_rotary(enc, q), _tg_apply_rotary(enc, k)
    attn = torch.softmax(q @ k.transpose(-1, -2) / DH**0.5, -1)
    ctx = (attn @ v).transpose(1, 2).flatten(-2)
    msg = ctx @ sd[f"{pre}.out_proj.weight"].T + sd[f"{pre}.out_proj.bias"]
    return x + _tg_ffn(sd, pre, x, msg)


def _tg_cross_block(sd, i, x0, x1):
    pre = f"transformers.{i}.cross_attn"
    heads = lambda t: t.unflatten(-1, (H, -1)).transpose(1, 2)
    qk0 = heads(x0 @ sd[f"{pre}.to_qk.weight"].T + sd[f"{pre}.to_qk.bias"])
    qk1 = heads(x1 @ sd[f"{pre}.to_qk.weight"].T + sd[f"{pre}.to_qk.bias"])
    v0 = heads(x0 @ sd[f"{pre}.to_v.weight"].T + sd[f"{pre}.to_v.bias"])
    v1 = heads(x1 @ sd[f"{pre}.to_v.weight"].T + sd[f"{pre}.to_v.bias"])
    scale = DH**-0.5
    sim = (qk0 * scale**0.5) @ (qk1 * scale**0.5).transpose(-1, -2)
    m0 = torch.softmax(sim, -1) @ v1
    m1 = torch.softmax(sim.transpose(-1, -2), -1) @ v0
    back = lambda t: t.transpose(1, 2).flatten(-2)
    m0 = back(m0) @ sd[f"{pre}.to_out.weight"].T + sd[f"{pre}.to_out.bias"]
    m1 = back(m1) @ sd[f"{pre}.to_out.weight"].T + sd[f"{pre}.to_out.bias"]
    return x0 + _tg_ffn(sd, pre, x0, m0), x1 + _tg_ffn(sd, pre, x1, m1)


def _tg_assignment(sd, i, d0, d1):
    w, b = sd[f"log_assignment.{i}.final_proj.weight"], sd[f"log_assignment.{i}.final_proj.bias"]
    md0, md1 = (d0 @ w.T + b) / D**0.25, (d1 @ w.T + b) / D**0.25
    sim = torch.einsum("bmd,bnd->bmn", md0, md1)
    wm, bm = sd[f"log_assignment.{i}.matchability.weight"], sd[f"log_assignment.{i}.matchability.bias"]
    z0, z1 = d0 @ wm.T + bm, d1 @ wm.T + bm
    cert = torch.nn.functional.logsigmoid(z0) + torch.nn.functional.logsigmoid(z1).transpose(1, 2)
    s0 = torch.log_softmax(sim, 2)
    s1 = torch.log_softmax(sim.transpose(-1, -2), 2).transpose(-1, -2)
    b_, m, n = sim.shape
    scores = sim.new_zeros((b_, m + 1, n + 1))
    scores[:, :m, :n] = s0 + s1 + cert
    scores[:, :-1, -1] = torch.nn.functional.logsigmoid(-z0.squeeze(-1))
    scores[:, -1, :-1] = torch.nn.functional.logsigmoid(-z1.squeeze(-1))
    return scores


def _tg_filter(scores, th):
    inner = scores[:, :-1, :-1]
    max0, max1 = inner.max(2), inner.max(1)
    m0, m1 = max0.indices, max1.indices
    idx0 = torch.arange(m0.shape[1])[None]
    idx1 = torch.arange(m1.shape[1])[None]
    mutual0 = idx0 == m1.gather(1, m0)
    mutual1 = idx1 == m0.gather(1, m1)
    ms0 = torch.where(mutual0, max0.values.exp(), torch.zeros(()))
    ms1 = torch.where(mutual1, ms0.gather(1, m1), torch.zeros(()))
    valid0 = mutual0 & (ms0 > th)
    valid1 = mutual1 & valid0.gather(1, m1)
    return (
        torch.where(valid0, m0, -1),
        torch.where(valid1, m1, -1),
        ms0,
        ms1,
    )


def torch_lightglue_forward(sd, kpts0, kpts1, desc0, desc1, size, conditional, th):
    kn0, kn1 = _tg_norm_kpts(kpts0, size), _tg_norm_kpts(kpts1, size)

    def posenc(kn, num):
        proj = kn @ sd["posenc.Wr.weight"].T
        if conditional:
            cond = torch.relu(num) @ sd["posenc.condition_modulation.weight"].T
            cond = cond + sd["posenc.condition_modulation.bias"]
            proj = proj + cond.unsqueeze(1)
        emb = torch.stack([proj.cos(), proj.sin()], 0).unsqueeze(-3)
        return emb.repeat_interleave(2, dim=-1)

    b, m = kpts0.shape[:2]
    n = kpts1.shape[1]
    enc0 = posenc(kn0, torch.full((b, 1), float(m)))
    enc1 = posenc(kn1, torch.full((b, 1), float(n)))
    d0, d1 = desc0, desc1
    for i in range(L):
        d0 = _tg_self_block(sd, i, d0, enc0)
        d1 = _tg_self_block(sd, i, d1, enc1)
        d0, d1 = _tg_cross_block(sd, i, d0, d1)
    scores = _tg_assignment(sd, L - 1, d0, d1)
    return (*_tg_filter(scores, th), scores)


class TestLightGlueWeightParity:
    @pytest.mark.parametrize("conditional", [False, True], ids=["fourier", "cond"])
    def test_converted_forward_matches_torch_reference(self, conditional):
        rng = np.random.RandomState(7)
        sd = make_lightglue_state(rng, conditional)
        state_np = {k: v.numpy() for k, v in sd.items()}
        tree = convert_lightglue(state_np, n_layers=L, num_heads=H)

        # conditional case uses m==n to exercise the stacked-sets scan path;
        # the plain case uses m!=n to exercise the per-set path
        b, m, n = (2, 32, 32) if conditional else (2, 40, 32)
        kpts0 = rng.uniform(0, 320, (b, m, 2)).astype(np.float32)
        kpts1 = rng.uniform(0, 320, (b, n, 2)).astype(np.float32)
        desc0 = rng.randn(b, m, D).astype(np.float32)
        desc1 = rng.randn(b, n, D).astype(np.float32)
        size = np.array([[320.0, 240.0]] * b, np.float32)
        th = 0.05

        tm0, tm1, tms0, tms1, tscores = torch_lightglue_forward(
            sd,
            torch.tensor(kpts0),
            torch.tensor(kpts1),
            torch.tensor(desc0),
            torch.tensor(desc1),
            torch.tensor(size),
            conditional,
            th,
        )

        model = get_model("lightglue").from_conf(
            {
                "input_dim": D,
                "descriptor_dim": D,
                "n_layers": L,
                "num_heads": H,
                "filter_threshold": th,
                "posenc": "conditional_fourier" if conditional else "fourier",
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
        # converted tree must cover every parameter of the model
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": {k: jnp.asarray(v) for k, v in tree["params"].items()}}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"

        pred = model.apply(got_tree, data)
        np.testing.assert_array_equal(np.asarray(pred["matches0"]), tm0.numpy())
        np.testing.assert_array_equal(np.asarray(pred["matches1"]), tm1.numpy())
        np.testing.assert_allclose(
            np.asarray(pred["matching_scores0"]), tms0.numpy(), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(pred["log_assignment"][:, :-1, :-1]),
            tscores[:, :-1, :-1].numpy(),
            atol=5e-3,
            rtol=2e-3,  # large-magnitude log-probs: fp32 accumulation order
        )

    def test_v01_renaming_shim_and_cli_roundtrip(self, tmp_path):
        """Old-style key names + real .pth file through the CLI path."""
        rng = np.random.RandomState(3)
        sd = make_lightglue_state(rng, conditional=False, v01_names=True)
        pth = tmp_path / "superpoint_lightglue.pth"
        torch.save(sd, str(pth))

        state = torch_io.load_state_dict(str(pth))
        state = rename_lightglue_v01(state, L)
        tree = convert_lightglue(state, n_layers=L, num_heads=H)
        sd_new = make_lightglue_state(rng, conditional=False)  # shape template
        assert set(tree["params"]) == set(
            convert_lightglue(
                {k: v.numpy() for k, v in sd_new.items()}, L, H
            )["params"]
        )
        npz = tmp_path / "lg.npz"
        from gluefactory_tpu.scripts.convert_weights import save_tree_npz

        save_tree_npz(tree, str(npz))
        from gluefactory_tpu.models.matchers.lightglue_pretrained import load_npz_params

        loaded = load_npz_params(npz)
        for k, v in tree["params"].items():
            np.testing.assert_array_equal(np.asarray(loaded["params"][k]), v)


# ---- SuperGlue ----


def make_superglue_state(rng, kenc_layers=(8, 16), n_gnn=2):
    """Fan-in-scaled random weights: keeps activations (and thus Sinkhorn
    log-scores) in a realistic range so the comparison is meaningful."""

    def _t(r, *shape):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        return torch.tensor((r.randn(*shape) / np.sqrt(fan_in)).astype(np.float32))

    sd = {}
    chans = [3, *kenc_layers, D]
    idx = 0
    for j in range(len(chans) - 1):
        sd[f"kenc.encoder.{idx}.weight"] = _t(rng, chans[j + 1], chans[j], 1)
        sd[f"kenc.encoder.{idx}.bias"] = _t(rng, chans[j + 1])
        if j < len(chans) - 2:
            c = chans[j + 1]
            sd[f"kenc.encoder.{idx + 1}.weight"] = torch.ones(c) + _t(rng, c) * 0.1
            sd[f"kenc.encoder.{idx + 1}.bias"] = _t(rng, c)
            sd[f"kenc.encoder.{idx + 1}.running_mean"] = _t(rng, c) * 0.5
            sd[f"kenc.encoder.{idx + 1}.running_var"] = torch.ones(c) + _t(rng, c).abs()
            idx += 3
        else:
            idx += 1
    for i in range(2 * n_gnn):
        pre = f"gnn.layers.{i}"
        for j in range(3):
            sd[f"{pre}.attn.proj.{j}.weight"] = _t(rng, D, D, 1)
            sd[f"{pre}.attn.proj.{j}.bias"] = _t(rng, D)
        sd[f"{pre}.attn.merge.weight"] = _t(rng, D, D, 1)
        sd[f"{pre}.attn.merge.bias"] = _t(rng, D)
        sd[f"{pre}.mlp.0.weight"] = _t(rng, 2 * D, 2 * D, 1)
        sd[f"{pre}.mlp.0.bias"] = _t(rng, 2 * D)
        sd[f"{pre}.mlp.1.weight"] = torch.ones(2 * D) + _t(rng, 2 * D) * 0.1
        sd[f"{pre}.mlp.1.bias"] = _t(rng, 2 * D)
        sd[f"{pre}.mlp.1.running_mean"] = _t(rng, 2 * D) * 0.5
        sd[f"{pre}.mlp.1.running_var"] = torch.ones(2 * D) + _t(rng, 2 * D).abs()
        sd[f"{pre}.mlp.3.weight"] = _t(rng, D, 2 * D, 1)
        sd[f"{pre}.mlp.3.bias"] = _t(rng, D)
    sd["final_proj.weight"] = _t(rng, D, D, 1)
    sd["final_proj.bias"] = _t(rng, D)
    sd["bin_score"] = torch.tensor(1.2)
    return sd


def _sg_mlp(sd, prefix, conv_idxs, x):
    """x: (B, C, N) channel-first like the reference conv1d stack."""
    for j, ci in enumerate(conv_idxs):
        w = sd[f"{prefix}.{ci}.weight"][:, :, 0]
        x = torch.einsum("oc,bcn->bon", w, x) + sd[f"{prefix}.{ci}.bias"][None, :, None]
        if j < len(conv_idxs) - 1:
            bn_p = f"{prefix}.{ci + 1}"
            mean = sd[f"{bn_p}.running_mean"][None, :, None]
            var = sd[f"{bn_p}.running_var"][None, :, None]
            x = (x - mean) / torch.sqrt(var + 1e-5)
            x = x * sd[f"{bn_p}.weight"][None, :, None] + sd[f"{bn_p}.bias"][None, :, None]
            x = torch.relu(x)
    return x


def torch_superglue_forward(sd, kpts0, kpts1, sc0, sc1, desc0, desc1, size, n_gnn, iters, th):
    def norm(kpts):
        shift = size / 2
        scale = size.max(1).values * 0.7
        return (kpts - shift[:, None]) / scale[:, None, None]

    def kenc(kpts, scores):
        x = torch.cat([norm(kpts).transpose(1, 2), scores.unsqueeze(1)], 1)
        return _sg_mlp(sd, "kenc.encoder", [0, 3, 6], x)

    d0 = desc0.transpose(1, 2) + kenc(kpts0, sc0)  # (B, D, N)
    d1 = desc1.transpose(1, 2) + kenc(kpts1, sc1)

    def attn_layer(i, x, source):
        pre = f"gnn.layers.{i}.attn"
        qkv = []
        for j, inp in enumerate((x, source, source)):
            w = sd[f"{pre}.proj.{j}.weight"][:, :, 0]
            y = torch.einsum("oc,bcn->bon", w, inp) + sd[f"{pre}.proj.{j}.bias"][None, :, None]
            qkv.append(y.view(y.shape[0], DH, H, -1))
        q, k, v = qkv
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / DH**0.5
        prob = torch.softmax(scores, dim=-1)
        msg = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        msg = msg.contiguous().view(msg.shape[0], D, -1)
        w = sd[f"{pre}.merge.weight"][:, :, 0]
        return torch.einsum("oc,bcn->bon", w, msg) + sd[f"{pre}.merge.bias"][None, :, None]

    for i in range(2 * n_gnn):
        if i % 2 == 0:
            delta0 = _sg_mlp(sd, f"gnn.layers.{i}.mlp", [0, 3], torch.cat([d0, attn_layer(i, d0, d0)], 1))
            delta1 = _sg_mlp(sd, f"gnn.layers.{i}.mlp", [0, 3], torch.cat([d1, attn_layer(i, d1, d1)], 1))
        else:
            delta0 = _sg_mlp(sd, f"gnn.layers.{i}.mlp", [0, 3], torch.cat([d0, attn_layer(i, d0, d1)], 1))
            delta1 = _sg_mlp(sd, f"gnn.layers.{i}.mlp", [0, 3], torch.cat([d1, attn_layer(i, d1, d0)], 1))
        d0, d1 = d0 + delta0, d1 + delta1

    w = sd["final_proj.weight"][:, :, 0]
    md0 = torch.einsum("oc,bcn->bon", w, d0) + sd["final_proj.bias"][None, :, None]
    md1 = torch.einsum("oc,bcn->bon", w, d1) + sd["final_proj.bias"][None, :, None]
    cost = torch.einsum("bdn,bdm->bnm", md0, md1) / D**0.5

    # log_optimal_transport (superglue.py:181-201)
    alpha = sd["bin_score"]
    b, m, n = cost.shape
    ms, ns = torch.tensor(float(m)), torch.tensor(float(n))
    bins0 = alpha.expand(b, m, 1)
    bins1 = alpha.expand(b, 1, n)
    alpha_e = alpha.expand(b, 1, 1)
    couplings = torch.cat(
        [torch.cat([cost, bins0], -1), torch.cat([bins1, alpha_e], -1)], 1
    )
    norm_c = -(ms + ns).log()
    log_mu = torch.cat([norm_c.expand(m), ns.log()[None] + norm_c])[None].expand(b, -1)
    log_nu = torch.cat([norm_c.expand(n), ms.log()[None] + norm_c])[None].expand(b, -1)
    u, v_ = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(couplings + v_.unsqueeze(1), dim=2)
        v_ = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
    Z = couplings + u.unsqueeze(2) + v_.unsqueeze(1) - norm_c
    return (*_tg_filter(Z, th), Z)


class TestSuperGlueWeightParity:
    def test_converted_forward_matches_torch_reference(self):
        rng = np.random.RandomState(11)
        n_gnn, iters, th = 2, 20, 0.1
        sd = make_superglue_state(rng, kenc_layers=(8, 16), n_gnn=n_gnn)
        tree = convert_superglue({k: v.numpy() for k, v in sd.items()}, n_gnn, H)

        b, m, n = 2, 24, 30
        kpts0 = rng.uniform(0, 320, (b, m, 2)).astype(np.float32)
        kpts1 = rng.uniform(0, 320, (b, n, 2)).astype(np.float32)
        sc0 = rng.rand(b, m).astype(np.float32)
        sc1 = rng.rand(b, n).astype(np.float32)
        desc0 = rng.randn(b, m, D).astype(np.float32)
        desc1 = rng.randn(b, n, D).astype(np.float32)
        desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)  # unit-norm like
        desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)  # real descriptors
        size = np.array([[320.0, 240.0]] * b, np.float32)

        tm0, tm1, tms0, tms1, tZ = torch_superglue_forward(
            sd,
            torch.tensor(kpts0), torch.tensor(kpts1),
            torch.tensor(sc0), torch.tensor(sc1),
            torch.tensor(desc0).contiguous(), torch.tensor(desc1),
            torch.tensor(size), n_gnn, iters, th,
        )

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
            np.asarray(pred["log_assignment"]), tZ.numpy(), atol=5e-3
        )
        np.testing.assert_array_equal(np.asarray(pred["matches0"]), tm0.numpy())
        np.testing.assert_array_equal(np.asarray(pred["matches1"]), tm1.numpy())
        np.testing.assert_allclose(
            np.asarray(pred["matching_scores0"]), tms0.numpy(), atol=2e-4
        )


# ---- SuperPoint via a real legacy-format file ----


class TestSuperPointLegacyFile:
    def test_legacy_pth_roundtrip(self, tmp_path):
        """superpoint_v1.pth is a legacy-format file; fabricate one with the
        official layer names and convert through the torch-free reader."""
        rng = np.random.RandomState(5)
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
        pth = tmp_path / "superpoint_v1.pth"
        torch.save(sd, str(pth), _use_new_zipfile_serialization=False)

        state = torch_io.load_state_dict(str(pth))
        tree = convert_superpoint(state)
        model = get_model("superpoint_magicleap").from_conf(
            {"max_num_keypoints": 32, "detection_threshold": 0.0}
        )
        img = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), {"image": img})
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got
        pred = model.apply(got_tree, {"image": img})
        assert np.isfinite(np.asarray(pred["keypoint_scores"])).all()


# --------------------------------------------------------------------------- #
# 3. integration floors with REAL weights (skipped without them)
# --------------------------------------------------------------------------- #

WEIGHTS_DIR = os.environ.get("GLUEFACTORY_TPU_WEIGHTS", "/root/repo/weights")


def _weights_available():
    return os.path.exists(os.path.join(WEIGHTS_DIR, "superpoint_v1.pth")) and any(
        os.path.exists(os.path.join(WEIGHTS_DIR, f))
        for f in ("superpoint_lightglue.pth", "superpoint_lightglue_v0-1_arxiv.pth")
    )


@pytest.mark.skipif(
    not _weights_available(),
    reason="official checkpoints not on disk (zero-egress env); place "
    "superpoint_v1.pth + superpoint_lightglue.pth under $GLUEFACTORY_TPU_WEIGHTS "
    "to run the reference integration floors (test_integration.py:106-108)",
)
class TestOfficialWeightFloors:
    def test_boat_pair_floors(self, tmp_path):
        """Reference floors: num_matches > 1300, prec@3px > 0.8 on the boat
        pair warped by the known homography (test_integration.py:73-108)."""
        import cv2  # noqa: F401  (only needed when real weights exist)

        from gluefactory_tpu.eval.export_helper import match_pair_with_weights

        lg = next(
            os.path.join(WEIGHTS_DIR, f)
            for f in ("superpoint_lightglue.pth", "superpoint_lightglue_v0-1_arxiv.pth")
            if os.path.exists(os.path.join(WEIGHTS_DIR, f))
        )
        result = match_pair_with_weights(
            os.path.join(WEIGHTS_DIR, "superpoint_v1.pth"), lg, tmp_path
        )
        assert result["num_matches"] > 1300
        assert result["prec@3px"] > 0.8


# --------------------------------------------------------------------------- #
# GlueStick converter parity
# --------------------------------------------------------------------------- #


def make_gluestick_state(rng, kenc_layers=(8, 16), n_gnn=2):
    """Upstream-keyed fabricated GlueStick weights (reference
    gluestick.py:64-105 module names), fan-in scaled."""

    def _t(r, *shape):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        return torch.tensor((r.randn(*shape) / np.sqrt(fan_in)).astype(np.float32))

    def mlp(sd, prefix, chans):
        idx = 0
        for j in range(len(chans) - 1):
            sd[f"{prefix}.{idx}.weight"] = _t(rng, chans[j + 1], chans[j], 1)
            sd[f"{prefix}.{idx}.bias"] = _t(rng, chans[j + 1])
            if j < len(chans) - 2:
                c = chans[j + 1]
                sd[f"{prefix}.{idx + 1}.weight"] = torch.ones(c) + _t(rng, c) * 0.1
                sd[f"{prefix}.{idx + 1}.bias"] = _t(rng, c)
                sd[f"{prefix}.{idx + 1}.running_mean"] = _t(rng, c) * 0.5
                sd[f"{prefix}.{idx + 1}.running_var"] = torch.ones(c) + _t(rng, c).abs()
                idx += 3
            else:
                idx += 1

    sd = {}
    mlp(sd, "kenc.encoder", [3, *kenc_layers, D])
    mlp(sd, "lenc.encoder", [5, *kenc_layers, D])
    for i in range(2 * n_gnn):
        pre = f"gnn.layers.{i}.update"
        for j in range(3):
            sd[f"{pre}.attn.proj.{j}.weight"] = _t(rng, D, D, 1)
            sd[f"{pre}.attn.proj.{j}.bias"] = _t(rng, D)
        sd[f"{pre}.attn.merge.weight"] = _t(rng, D, D, 1)
        sd[f"{pre}.attn.merge.bias"] = _t(rng, D)
        mlp(sd, f"{pre}.mlp", [2 * D, 2 * D, D])
    for i in range(n_gnn):
        mlp(sd, f"gnn.line_layers.{i}.mlp", [3 * D, 2 * D, D])
    for name in ("final_proj", "final_line_proj"):
        sd[f"{name}.weight"] = _t(rng, D, D, 1)
        sd[f"{name}.bias"] = _t(rng, D)
    sd["bin_score"] = torch.tensor(1.1)
    sd["line_bin_score"] = torch.tensor(0.9)
    return sd


def _gs_log_double_softmax(scores, bin_score):
    """reference gluestick.py:761-773."""
    b, m, n = scores.shape
    bin_ = bin_score[None, None, None]
    s0 = torch.cat([scores, bin_.expand(b, m, 1)], 2)
    s1 = torch.cat([scores, bin_.expand(b, 1, n)], 1)
    s0 = torch.nn.functional.log_softmax(s0, 2)
    s1 = torch.nn.functional.log_softmax(s1, 1)
    out = scores.new_full((b, m + 1, n + 1), 0.0)
    out[:, :m, :n] = (s0[:, :, :n] + s1[:, :m, :]) / 2
    out[:, :-1, -1] = s0[:, :, -1]
    out[:, -1, :-1] = s1[:, -1, :]
    return out


def _gs_get_matches(Z, th):
    """reference gluestick.py:314-328."""
    max0 = Z[:, :-1, :-1].max(2)
    max1 = Z[:, :-1, :-1].max(1)
    m0, m1 = max0.indices, max1.indices
    ar = lambda x, d: x.new_ones(x.shape[d]).cumsum(0) - 1
    mutual0 = ar(m0, 1)[None] == m1.gather(1, m0)
    mutual1 = ar(m1, 1)[None] == m0.gather(1, m1)
    zero = Z.new_tensor(0)
    ms0 = torch.where(mutual0, max0.values.exp(), zero)
    ms1 = torch.where(mutual1, ms0.gather(1, m1), zero)
    valid0 = mutual0 & (ms0 > th)
    valid1 = mutual1 & valid0.gather(1, m1)
    m0 = torch.where(valid0, m0, m0.new_tensor(-1))
    m1 = torch.where(valid1, m1, m1.new_tensor(-1))
    return m0, m1, ms0, ms1


def torch_gluestick_forward(
    sd, kpts0, kpts1, sc0, sc1, desc0, desc1, lines0, lines1, lsc0, lsc1,
    lj0, lj1, size, n_gnn, th,
):
    """Test-local torch implementation of the published GlueStick math
    (reference gluestick.py forward; BN in eval mode)."""
    n_enc = 3  # convs in the kenc/lenc MLP for kenc_layers=(8,16)
    enc_idxs = [0, 3, 6]

    def norm(kpts):
        c = size / 2
        f = size.max(1, keepdim=True).values * 0.7
        return (kpts - c[:, None, :]) / f[:, None, :]

    def kenc(kpts, scores):
        x = torch.cat([norm(kpts).transpose(1, 2), scores.unsqueeze(1)], 1)
        return _sg_mlp(sd, "kenc.encoder", enc_idxs, x)

    def lenc(lines, lscores):
        b, L = lines.shape[:2]
        eps = norm(lines.flatten(1, 2)).reshape(b, L, 2, 2)
        off = (eps[:, :, 1] - eps[:, :, 0]).unsqueeze(2)
        off = torch.cat([off, -off], dim=2).reshape(b, 2 * L, 2).transpose(1, 2)
        inputs = torch.cat(
            [eps.flatten(1, 2).transpose(1, 2), off, lscores.repeat(1, 2).unsqueeze(1)], 1
        )
        return _sg_mlp(sd, "lenc.encoder", enc_idxs, inputs)

    d0 = desc0.transpose(1, 2) + kenc(kpts0, sc0)  # (B, D, J)
    d1 = desc1.transpose(1, 2) + kenc(kpts1, sc1)
    le0, le1 = lenc(lines0, lsc0), lenc(lines1, lsc1)

    def attn(pre, x, source):
        qkv = []
        for j, inp in enumerate((x, source, source)):
            w = sd[f"{pre}.proj.{j}.weight"][:, :, 0]
            y = torch.einsum("oc,bcn->bon", w, inp) + sd[f"{pre}.proj.{j}.bias"][None, :, None]
            qkv.append(y.view(y.shape[0], DH, H, -1))
        q, k, v = qkv
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / DH**0.5
        prob = torch.softmax(scores, dim=-1)
        msg = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        msg = msg.contiguous().view(msg.shape[0], D, -1)
        w = sd[f"{pre}.merge.weight"][:, :, 0]
        return torch.einsum("oc,bcn->bon", w, msg) + sd[f"{pre}.merge.bias"][None, :, None]

    def line_layer(li, ld, line_enc, lj):
        idx = lj[:, None].repeat(1, D, 1)
        ldg = torch.gather(ld, 2, idx)
        ld2 = ldg.reshape(ld.shape[0], D, -1, 2).flip([-1]).flatten(2, 3)
        msg = _sg_mlp(
            sd, f"gnn.line_layers.{li}.mlp", [0, 3],
            torch.cat([ldg, ld2, line_enc], 1),
        )
        upd = torch.zeros_like(ld).scatter_reduce_(
            2, idx, msg, reduce="mean", include_self=False
        )
        return ld + upd

    for i in range(2 * n_gnn):
        pre = f"gnn.layers.{i}.update"
        if i % 2 == 0:
            delta0 = _sg_mlp(sd, f"{pre}.mlp", [0, 3], torch.cat([d0, attn(f"{pre}.attn", d0, d0)], 1))
            delta1 = _sg_mlp(sd, f"{pre}.mlp", [0, 3], torch.cat([d1, attn(f"{pre}.attn", d1, d1)], 1))
            d0, d1 = d0 + delta0, d1 + delta1
            d0 = line_layer(i // 2, d0, le0, lj0)
            d1 = line_layer(i // 2, d1, le1, lj1)
        else:
            delta0 = _sg_mlp(sd, f"{pre}.mlp", [0, 3], torch.cat([d0, attn(f"{pre}.attn", d0, d1)], 1))
            delta1 = _sg_mlp(sd, f"{pre}.mlp", [0, 3], torch.cat([d1, attn(f"{pre}.attn", d1, d0)], 1))
            d0, d1 = d0 + delta0, d1 + delta1

    def proj(name, x):
        w = sd[f"{name}.weight"][:, :, 0]
        return torch.einsum("oc,bcn->bon", w, x) + sd[f"{name}.bias"][None, :, None]

    md0, md1 = proj("final_proj", d0), proj("final_proj", d1)
    kp_scores = torch.einsum("bdn,bdm->bnm", md0, md1) / D**0.5
    Z = _gs_log_double_softmax(kp_scores, sd["bin_score"])
    m0, m1, ms0, ms1 = _gs_get_matches(Z, th)

    # lines (reference _get_line_matches :329-369)
    ml0, ml1 = proj("final_line_proj", d0), proj("final_line_proj", d1)
    ls = torch.einsum("bdn,bdm->bnm", ml0, ml1) / D**0.5
    n2l0, n2l1 = lj0.shape[1], lj1.shape[1]
    ls = torch.gather(ls, 2, lj1[:, None, :].repeat(1, ls.shape[1], 1))
    ls = torch.gather(ls, 1, lj0[:, :, None].repeat(1, 1, n2l1))
    ls = ls.reshape(-1, n2l0 // 2, 2, n2l1 // 2, 2)
    raw = 0.5 * torch.maximum(
        ls[:, :, 0, :, 0] + ls[:, :, 1, :, 1], ls[:, :, 0, :, 1] + ls[:, :, 1, :, 0]
    )
    lZ = _gs_log_double_softmax(raw, sd["line_bin_score"])
    lm0, lm1, lms0, lms1 = _gs_get_matches(lZ, th)
    return Z, m0, m1, ms0, lZ, lm0, raw


class TestGlueStickWeightParity:
    def test_converted_forward_matches_torch_reference(self):
        from gluefactory_tpu.scripts.convert_weights import convert_gluestick

        rng = np.random.RandomState(13)
        n_gnn, th = 2, 0.2
        sd = make_gluestick_state(rng, kenc_layers=(8, 16), n_gnn=n_gnn)
        tree = convert_gluestick({k: v.numpy() for k, v in sd.items()}, n_gnn, H)

        b, L0, L1 = 2, 5, 6
        m, n = 2 * L0 + 6, 2 * L1 + 4  # junctions: line endpoints first
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
        # endpoint junction ids in [0, 2L), with repeats (shared junctions)
        lj0 = rng.randint(0, 2 * L0, (b, 2 * L0)).astype(np.int64)
        lj1 = rng.randint(0, 2 * L1, (b, 2 * L1)).astype(np.int64)
        size = np.array([[320.0, 240.0]] * b, np.float32)

        tZ, tm0, tm1, tms0, tlZ, tlm0, traw = torch_gluestick_forward(
            sd,
            torch.tensor(kpts0), torch.tensor(kpts1),
            torch.tensor(sc0), torch.tensor(sc1),
            torch.tensor(desc0), torch.tensor(desc1),
            torch.tensor(lines0), torch.tensor(lines1),
            torch.tensor(lsc0), torch.tensor(lsc1),
            torch.tensor(lj0), torch.tensor(lj1),
            torch.tensor(size), n_gnn, th,
        )

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
            np.asarray(pred["log_assignment"]), tZ.numpy(), atol=5e-3
        )
        np.testing.assert_array_equal(np.asarray(pred["matches0"]), tm0.numpy())
        np.testing.assert_array_equal(np.asarray(pred["matches1"]), tm1.numpy())
        np.testing.assert_allclose(
            np.asarray(pred["matching_scores0"]), tms0.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pred["raw_line_scores"]), traw.numpy(), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(pred["line_log_assignment"]), tlZ.numpy(), atol=5e-3
        )
        np.testing.assert_array_equal(
            np.asarray(pred["line_matches0"]), tlm0.numpy()
        )


# --------------------------------------------------------------------------- #
# ALIKED converter parity
# --------------------------------------------------------------------------- #


def make_aliked_state(rng, cfg=(8, 16, 32, 64, 64, 3, 16)):
    """Upstream-keyed fabricated ALIKED weights (reference aliked.py module
    names: ConvBlock/ResBlock + dcn blocks 3/4, score head, SDDH)."""
    c1, c2, c3, c4, dim, K, M = cfg

    def _t(r, *shape, scale=1.0):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        return torch.tensor((r.randn(*shape) * scale / np.sqrt(fan_in)).astype(np.float32))

    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.ones(c) + _t(rng, c) * 0.1
        sd[f"{prefix}.bias"] = _t(rng, c)
        sd[f"{prefix}.running_mean"] = _t(rng, c) * 0.2
        sd[f"{prefix}.running_var"] = torch.ones(c) + _t(rng, c).abs() * 0.3

    def conv(prefix, co, ci, k, bias=False):
        sd[f"{prefix}.weight"] = _t(rng, co, ci, k, k)
        if bias:
            sd[f"{prefix}.bias"] = _t(rng, co)

    def block(name, ci, co, dcn=False, down=True):
        for j, cin in ((1, ci), (2, co)):
            if dcn:
                conv(f"{name}.conv{j}.offset_conv", 18, cin, 3, bias=True)
                # small offsets keep the bilinear taps in a comparable regime
                sd[f"{name}.conv{j}.offset_conv.weight"] *= 0.3
                conv(f"{name}.conv{j}.regular_conv", co, cin, 3)
            else:
                conv(f"{name}.conv{j}", co, cin, 3)
            bn(f"{name}.bn{j}", co)
        if down:
            conv(f"{name}.downsample", co, ci, 1, bias=True)

    block("block1", 3, c1, down=False)
    block("block2", c1, c2)
    block("block3", c2, c3, dcn=True)
    block("block4", c3, c4, dcn=True)
    conv("conv1", dim // 4, c1, 1)
    conv("conv2", dim // 4, c2, 1)
    conv("conv3", dim // 4, c3, 1)
    conv("conv4", dim // 4, c4, 1)
    conv("score_head.0", 8, dim, 1)
    conv("score_head.2", 4, 8, 3)
    conv("score_head.4", 4, 4, 3)
    conv("score_head.6", 1, 4, 3)
    conv("desc_head.offset_conv.0", 2 * M, dim, K, bias=True)
    sd["desc_head.offset_conv.0.weight"] *= 0.5
    conv("desc_head.offset_conv.2", 2 * M, 2 * M, 1, bias=True)
    conv("desc_head.sf_conv", dim, dim, 1)
    sd["desc_head.agg_weights"] = _t(rng, M, dim, dim, scale=3.0)
    return sd


def _torch_deform_conv2d(x, offset, weight, bias):
    """Reference-math DCNv1 (3x3, stride 1, pad 1, zero outside): the
    torchvision op's offset layout [dy, dx] per row-major tap."""
    B, C, H, W = x.shape
    co = weight.shape[0]
    ys = torch.arange(H, dtype=x.dtype)[:, None].expand(H, W)
    xs = torch.arange(W, dtype=x.dtype)[None, :].expand(H, W)
    out = torch.zeros(B, co, H, W, dtype=x.dtype)
    for k in range(9):
        ky, kx = k // 3, k % 3
        py = ys[None] + (ky - 1) + offset[:, 2 * k]
        px = xs[None] + (kx - 1) + offset[:, 2 * k + 1]
        x0 = torch.floor(px); y0 = torch.floor(py)
        wx = px - x0; wy = py - y0
        acc = torch.zeros(B, C, H, W, dtype=x.dtype)
        for ix, iy, wgt in (
            (x0, y0, (1 - wx) * (1 - wy)), (x0 + 1, y0, wx * (1 - wy)),
            (x0, y0 + 1, (1 - wx) * wy), (x0 + 1, y0 + 1, wx * wy),
        ):
            inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            ixc = ix.long().clamp(0, W - 1)
            iyc = iy.long().clamp(0, H - 1)
            flat = (iyc * W + ixc).reshape(B, 1, H * W).expand(B, C, H * W)
            v = torch.gather(x.reshape(B, C, H * W), 2, flat).reshape(B, C, H, W)
            acc = acc + v * (wgt * inb.to(x.dtype))[:, None]
        out = out + torch.einsum("bchw,oc->bohw", acc, weight[:, :, ky, kx])
    return out + bias[None, :, None, None]


def torch_aliked_forward(sd, image, cfg, top_k, nms_radius=2):
    """Test-local torch ALIKED forward (reference aliked.py, BN eval)."""
    import torch.nn.functional as F

    c1_, c2_, c3_, c4_, dim, K, M = cfg

    def bn(x, prefix):
        mean = sd[f"{prefix}.running_mean"][None, :, None, None]
        var = sd[f"{prefix}.running_var"][None, :, None, None]
        w = sd[f"{prefix}.weight"][None, :, None, None]
        b = sd[f"{prefix}.bias"][None, :, None, None]
        return (x - mean) / torch.sqrt(var + 1e-5) * w + b

    def conv(x, prefix, pad=1):
        b = sd.get(f"{prefix}.bias")
        return F.conv2d(x, sd[f"{prefix}.weight"], b, padding=pad)

    def blockconv(x, name, j, dcn):
        if dcn:
            h, w = x.shape[2:]
            off = conv(x, f"{name}.conv{j}.offset_conv").clamp(
                -max(h, w) / 4.0, max(h, w) / 4.0
            )
            y = _torch_deform_conv2d(
                x, off, sd[f"{name}.conv{j}.regular_conv.weight"],
                torch.zeros(sd[f"{name}.conv{j}.regular_conv.weight"].shape[0]),
            )
        else:
            y = conv(x, f"{name}.conv{j}")
        return bn(y, f"{name}.bn{j}")

    selu = torch.nn.functional.selu

    def convblock(x, name, dcn=False):
        x = selu(blockconv(x, name, 1, dcn))
        return selu(blockconv(x, name, 2, dcn))

    def resblock(x, name, dcn=False):
        out = selu(blockconv(x, name, 1, dcn))
        out = blockconv(out, name, 2, dcn)
        identity = conv(x, f"{name}.downsample", pad=0)
        return selu(out + identity)

    x1 = convblock(image, "block1")
    x2 = resblock(F.avg_pool2d(x1, 2), "block2")
    x3 = resblock(F.avg_pool2d(x2, 4), "block3", dcn=True)
    x4 = resblock(F.avg_pool2d(x3, 4), "block4", dcn=True)

    hp, wp = x1.shape[2:]
    a1 = selu(conv(x1, "conv1", pad=0))
    a2 = selu(conv(x2, "conv2", pad=0))
    a3 = selu(conv(x3, "conv3", pad=0))
    a4 = selu(conv(x4, "conv4", pad=0))
    up = lambda t: F.interpolate(t, size=(hp, wp), mode="bilinear", align_corners=True)
    x1234 = torch.cat([a1, up(a2), up(a3), up(a4)], 1)

    s = selu(conv(x1234, "score_head.0", pad=0))
    s = selu(conv(s, "score_head.2"))
    s = selu(conv(s, "score_head.4"))
    score_map = torch.sigmoid(conv(s, "score_head.6"))
    fmap = F.normalize(x1234, p=2, dim=1)

    # DKD top-k (reference :73-243)
    from gluefactory_tpu.models.extractors.superpoint_open import simple_nms as jnms
    nms_np = np.asarray(
        jnms(jnp.asarray(score_map[:, 0].numpy()), nms_radius)
    )  # our NMS == reference simple_nms (parity-tested elsewhere)
    nms = torch.tensor(nms_np)
    r = nms_radius
    nms[:, :r, :] = 0; nms[:, :, :r] = 0; nms[:, -r:, :] = 0; nms[:, :, -r:] = 0
    b, h, w = nms.shape
    topv, topi = torch.topk(nms.reshape(b, -1), top_k)
    xs_i = (topi % w).float()
    ys_i = (topi // w).float()
    # soft-argmax
    ks = 2 * r + 1
    gy, gx = np.meshgrid(np.linspace(-r, r, ks), np.linspace(-r, r, ks), indexing="ij")
    grid = torch.tensor(np.stack([gx, gy], -1).reshape(-1, 2), dtype=torch.float32)
    pads = F.pad(score_map, (r, r, r, r))
    wins = []
    for bi in range(b):
        ws_ = []
        for ki in range(top_k):
            cy, cx = int(ys_i[bi, ki]), int(xs_i[bi, ki])
            ws_.append(pads[bi, 0, cy : cy + ks, cx : cx + ks].reshape(-1))
        wins.append(torch.stack(ws_))
    win = torch.stack(wins)  # (B, K, ks*ks)
    max_v = win.max(-1, keepdim=True).values
    x_exp = ((win - max_v) / 0.1).exp()
    residual = (x_exp @ grid) / x_exp.sum(-1, keepdim=True)
    kp_xy = torch.stack([xs_i, ys_i], -1) + residual
    wh1 = torch.tensor([w - 1.0, h - 1.0])
    kp_norm = kp_xy / wh1 * 2 - 1
    kptscore = F.grid_sample(
        score_map, kp_norm.view(b, 1, -1, 2), mode="bilinear", align_corners=True
    )[:, 0, 0, :]

    # SDDH
    descs = []
    for bi in range(b):
        xi = fmap[bi]
        kpts_wh = kp_xy[bi]
        N = kpts_wh.shape[0]
        # reference: corner = (kpts.long() - ps/2 + 1).long() (trunc)
        corner = (kpts_wh.long().float() - K / 2 + 1).long()
        corner[:, 0] = corner[:, 0].clamp(0, w - 1 - K)
        corner[:, 1] = corner[:, 1].clamp(0, h - 1 - K)
        patches = []
        for n in range(N):
            cx, cy = int(corner[n, 0]), int(corner[n, 1])
            patches.append(xi[:, cy : cy + K, cx : cx + K])
        patch = torch.stack(patches)  # (N, C, K, K)
        o = F.conv2d(
            patch, sd["desc_head.offset_conv.0.weight"],
            sd["desc_head.offset_conv.0.bias"],
        )
        o = selu(o)
        o = F.conv2d(
            o, sd["desc_head.offset_conv.2.weight"], sd["desc_head.offset_conv.2.bias"]
        )
        o = o.clamp(-max(h, w) / 4.0, max(h, w) / 4.0)
        off = o[:, :, 0, 0].view(N, 2, M).permute(0, 2, 1)  # (N, M, 2)
        pos = kpts_wh[:, None] + off
        pos_n = 2.0 * pos / wh1[None, None] - 1
        feats = F.grid_sample(
            xi[None], pos_n.reshape(1, N * M, 1, 2), mode="bilinear",
            align_corners=True,
        ).reshape(xi.shape[0], N, M, 1).permute(1, 0, 2, 3)
        feats = selu(F.conv2d(feats, sd["desc_head.sf_conv.weight"])).squeeze(-1)
        d = torch.einsum("ncp,pcd->nd", feats, sd["desc_head.agg_weights"])
        descs.append(F.normalize(d, p=2.0, dim=1))
    desc = torch.stack(descs)
    return score_map[:, 0], kp_xy, kptscore, desc


class TestALIKEDWeightParity:
    def test_converted_forward_matches_torch_reference(self):
        from gluefactory_tpu.scripts.convert_weights import convert_aliked

        cfg = (8, 16, 32, 64, 64, 3, 16)  # aliked-t16
        rng = np.random.RandomState(17)
        sd = make_aliked_state(rng, cfg)
        tree = convert_aliked({k: v.numpy() for k, v in sd.items()})

        img = rng.rand(1, 64, 64, 3).astype(np.float32)
        top_k = 24
        t_score, t_kp, t_ks, t_desc = torch_aliked_forward(
            sd, torch.tensor(img.transpose(0, 3, 1, 2)), cfg, top_k
        )

        model = get_model("aliked").from_conf(
            {"model_name": "aliked-t16", "max_num_keypoints": top_k,
             "detection_threshold": 0.0}
        )
        data = {"image": jnp.asarray(img)}
        variables = model.init(jax.random.PRNGKey(0), data)
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"

        pred = model.apply(got_tree, data)
        np.testing.assert_allclose(
            np.asarray(pred["score_map"]), t_score.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pred["keypoints"]), t_kp.numpy(), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(pred["keypoint_scores"]), t_ks.numpy(), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(pred["descriptors"]), t_desc.numpy(), atol=5e-3
        )


@pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS_DIR, "aliked-n16.pth")),
    reason="aliked-n16.pth not on disk (zero-egress env); place it under "
    "$GLUEFACTORY_TPU_WEIGHTS to smoke the converted official backbone",
)
class TestALIKEDOfficialWeights:
    def test_official_aliked_detects_corners(self):
        """With real aliked-n16 weights the detector must fire on a synthetic
        checkerboard: > 50 of 64 inner corners within 2 px."""
        from gluefactory_tpu.scripts.convert_weights import convert_aliked
        from gluefactory_tpu.utils import torch_io

        state = torch_io.load_state_dict(os.path.join(WEIGHTS_DIR, "aliked-n16.pth"))
        tree = convert_aliked({k: np.asarray(v) for k, v in state.items()})
        model = get_model("aliked").from_conf(
            {"model_name": "aliked-n16", "max_num_keypoints": 256,
             "detection_threshold": 0.0}
        )
        img = np.zeros((1, 288, 288, 3), np.float32)
        sq = 32
        for i in range(9):
            for j in range(9):
                if (i + j) % 2 == 0:
                    img[0, i * sq : (i + 1) * sq, j * sq : (j + 1) * sq] = 1.0
        pred = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])},
            {"image": jnp.asarray(img)},
        )
        kp = np.asarray(pred["keypoints"][0])
        corners = np.array(
            [[x * sq, y * sq] for x in range(1, 9) for y in range(1, 9)], np.float32
        )
        d = np.linalg.norm(kp[None] - corners[:, None], axis=-1).min(1)
        assert (d < 2.0).sum() > 50


@pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS_DIR, "checkpoint_GlueStick_MD.tar")),
    reason="checkpoint_GlueStick_MD.tar not on disk (zero-egress env); place "
    "it under $GLUEFACTORY_TPU_WEIGHTS to smoke converted GlueStick",
)
class TestGlueStickOfficialWeights:
    def test_official_gluestick_loads_and_runs(self):
        from gluefactory_tpu.scripts.convert_weights import convert_gluestick
        from gluefactory_tpu.utils import torch_io

        state = torch_io.load_state_dict(
            os.path.join(WEIGHTS_DIR, "checkpoint_GlueStick_MD.tar")
        )
        state = {
            k[len("model."):]: np.asarray(v)
            for k, v in state.items() if k.startswith("model.")
        }
        tree = convert_gluestick(state)
        model = get_model("gluestick").from_conf(
            {"ln": False, "compat_tiled_line_scores": True}
        )
        rng = np.random.RandomState(0)
        b, m, L = 1, 40, 8
        data = {
            "keypoints0": jnp.asarray(rng.rand(b, m, 2) * 300, jnp.float32),
            "keypoints1": jnp.asarray(rng.rand(b, m, 2) * 300, jnp.float32),
            "keypoint_scores0": jnp.asarray(rng.rand(b, m), jnp.float32),
            "keypoint_scores1": jnp.asarray(rng.rand(b, m), jnp.float32),
            "descriptors0": jnp.asarray(rng.randn(b, m, 256), jnp.float32),
            "descriptors1": jnp.asarray(rng.randn(b, m, 256), jnp.float32),
            "lines0": jnp.asarray(rng.rand(b, L, 2, 2) * 300, jnp.float32),
            "lines1": jnp.asarray(rng.rand(b, L, 2, 2) * 300, jnp.float32),
            "line_scores0": jnp.asarray(rng.rand(b, L), jnp.float32),
            "line_scores1": jnp.asarray(rng.rand(b, L), jnp.float32),
            "lines_junc_idx0": jnp.asarray(rng.randint(0, 2 * L, (b, 2 * L))),
            "lines_junc_idx1": jnp.asarray(rng.randint(0, 2 * L, (b, 2 * L))),
            "view0": {"image_size": jnp.asarray([[320.0, 240.0]])},
            "view1": {"image_size": jnp.asarray([[320.0, 240.0]])},
        }
        pred = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}, data
        )
        assert np.isfinite(np.asarray(pred["log_assignment"])).all()


# --------------------------------------------------------------------------- #
# DINOv2 converter parity (verified against the in-env transformers impl)
# --------------------------------------------------------------------------- #


class TestDinov2WeightParity:
    def test_converted_forward_matches_transformers(self):
        transformers = pytest.importorskip("transformers")
        from gluefactory_tpu.scripts.convert_weights import convert_dinov2

        cfg = transformers.Dinov2Config(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=256, patch_size=14, image_size=56,
            layerscale_value=0.1, hidden_act="gelu",
        )
        torch.manual_seed(3)
        hf = transformers.Dinov2Model(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        tree = convert_dinov2(sd)

        rng = np.random.RandomState(4)
        img = rng.rand(2, 56, 56, 3).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.tensor(img.transpose(0, 3, 1, 2)))
        t_hidden = out.last_hidden_state.numpy()  # (B, 1+16, 64)

        model = get_model("dinov2").from_conf(
            {"embed_dim": 64, "depth": 2, "num_heads": 2,
             "pos_grid": cfg.image_size // cfg.patch_size, "patch_size": 14}
        )
        data = {"image": jnp.asarray(img)}
        variables = model.init(jax.random.PRNGKey(0), data)
        want = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
        got_tree = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        got = jax.tree_util.tree_map(lambda x: x.shape, got_tree["params"])
        assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"

        pred = model.apply(got_tree, data)
        ours_cls = np.asarray(pred["global_descriptor"])
        ours_patches = np.asarray(pred["features"]).reshape(2, -1, 64)
        np.testing.assert_allclose(ours_cls, t_hidden[:, 0], atol=2e-4)
        np.testing.assert_allclose(ours_patches, t_hidden[:, 1:], atol=2e-4)
