"""Converter parity for the round-5 checkpoint families: official DISK and
LoFTR (VERDICT r4 next #7).

Pattern follows tests/test_convert_weights.py: a test-local torch
implementation of the OFFICIAL architecture (written from the published
repos: jatentaki/disk's thin pre-activation U-Net as vendored by kornia;
zju3dv/LoFTR's ResNetFPN_8_2 + linear-attention transformer), fabricated
random state dicts, and numerical parity of our converted JAX model against
the torch forward. Official-weight smoke tests activate when real files are
placed under $GLUEFACTORY_TPU_WEIGHTS.

Reference wrappers being replaced:
  /root/reference/gluefactory/models/extractors/disk_kornia.py:8-120
  /root/reference/gluefactory/models/matchers/kornia_loftr.py:7-88
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from gluefactory_tpu.models import get_model
from gluefactory_tpu.scripts.convert_weights import convert_disk

WEIGHTS_DIR = os.environ.get("GLUEFACTORY_TPU_WEIGHTS", "weights/official")


# --------------------------------------------------------------------------- #
# torch replica: official DISK thin U-Net
# --------------------------------------------------------------------------- #
class _ConvBlock(nn.Sequential):
    """Pre-activation thin conv block: InstanceNorm -> PReLU -> Conv(5x5)."""

    def __init__(self, cin, cout, is_first=False):
        mods = []
        if not is_first:
            mods += [nn.InstanceNorm2d(cin), nn.PReLU(cin)]
        mods += [nn.Conv2d(cin, cout, 5, padding=2)]
        super().__init__(*mods)


class _DownBlock(nn.Sequential):
    def __init__(self, cin, cout, is_first=False):
        mods = [] if is_first else [nn.AvgPool2d(2)]
        mods += [_ConvBlock(cin, cout, is_first=is_first)]
        super().__init__(*mods)


class _UpBlock(nn.Module):
    def __init__(self, c_bottom, c_skip, cout):
        super().__init__()
        self.conv = _ConvBlock(c_bottom + c_skip, cout)

    def forward(self, bottom, skip):
        up = F.interpolate(bottom, scale_factor=2, mode="nearest")
        return self.conv(torch.cat([up, skip], dim=1))


class TorchDisk(nn.Module):
    def __init__(self, down=(16, 32, 64, 64, 64), up=(64, 64, 64, 129)):
        super().__init__()
        d_in = [3] + list(down[:-1])
        self.path_down = nn.ModuleList(
            [_DownBlock(cin, cout, is_first=(i == 0))
             for i, (cin, cout) in enumerate(zip(d_in, down))]
        )
        bot = [down[-1]] + list(up[:-1])
        skips = list(down[-2::-1])
        self.path_up = nn.ModuleList(
            [_UpBlock(b, s, cout) for b, s, cout in zip(bot, skips, up)]
        )

    def forward(self, x):
        feats = []
        for block in self.path_down:
            x = block(x)
            feats.append(x)
        x = feats[-1]
        for i, block in enumerate(self.path_up):
            x = block(x, feats[-2 - i])
        return x  # (B, desc_dim + 1, H, W); heatmap is the LAST channel


class TestDISKWeightParity:
    def test_converted_dense_matches_torch_reference(self):
        torch.manual_seed(3)
        net = TorchDisk().eval()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        tree = convert_disk(sd)

        rng = np.random.RandomState(5)
        img = rng.rand(2, 48, 64, 3).astype(np.float32)
        with torch.no_grad():
            t_out = net(torch.tensor(img.transpose(0, 3, 1, 2)))
        t_desc = t_out[:, :128].permute(0, 2, 3, 1).numpy()
        t_heat = t_out[:, 128].numpy()

        model = get_model("disk_official").from_conf({})
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        heat, dense = model.apply(
            variables, jnp.asarray(img), method="dense_forward"
        )
        np.testing.assert_allclose(np.asarray(heat), t_heat, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dense), t_desc, atol=2e-4)

    def test_param_tree_shapes_match_model(self):
        """convert_disk output must drop into the flax model unchanged."""
        torch.manual_seed(0)
        sd = {k: v.detach().numpy() for k, v in TorchDisk().state_dict().items()}
        tree = convert_disk(sd)
        model = get_model("disk_official").from_conf({})
        init = model.init(
            jax.random.PRNGKey(0), {"image": jnp.zeros((1, 32, 32, 3))}
        )
        want = jax.tree_util.tree_map(lambda x: x.shape, init["params"])
        got = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, tree["params"])
        assert want == got, f"{want}\nvs\n{got}"

    def test_grid_nms_keypoints(self):
        """kornia heatmap_to_keypoints semantics: at most one keypoint per
        non-overlapping window, argmax position, +0.5 px, scores sorted."""
        torch.manual_seed(1)
        net = TorchDisk().eval()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        tree = convert_disk(sd)
        model = get_model("disk_official").from_conf(
            {"max_num_keypoints": 32, "detection_threshold": -1e9}
        )
        rng = np.random.RandomState(2)
        # 80 is divisible by 16 (no pad -> InstanceNorm stats identical
        # between __call__ and the direct dense_forward) and by the window 5
        img = rng.rand(1, 80, 80, 3).astype(np.float32)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        pred = model.apply(variables, {"image": jnp.asarray(img)})
        kp = np.asarray(pred["keypoints"][0]) - 0.5
        sc = np.asarray(pred["keypoint_scores"][0])
        heat, _ = model.apply(variables, jnp.asarray(img), method="dense_forward")
        heat = np.asarray(heat[0])
        # every reported keypoint carries its heatmap value and is the argmax
        # of its 5x5 window
        for (x, y), s in zip(kp[:10].astype(int), sc[:10]):
            np.testing.assert_allclose(heat[y, x], s, atol=1e-5)
            wy, wx = (y // 5) * 5, (x // 5) * 5
            assert heat[wy:wy + 5, wx:wx + 5].max() <= s + 1e-6
        # one keypoint per window
        wins = {(int(y) // 5, int(x) // 5) for x, y in kp}
        assert len(wins) == len(kp)
        assert (np.diff(sc) <= 1e-6).all()


class TestOfficialModelComposition:
    """The official-architecture models compose with the standard pipeline
    and config machinery (random init — API surface, not quality)."""

    def test_disk_official_in_two_view_pipeline(self, rng):
        pipe = get_model("two_view_pipeline").from_conf(
            {
                "extractor": {"name": "disk_official", "max_num_keypoints": 64},
                "matcher": {"name": "nearest_neighbor_matcher",
                            "mutual_check": True},
            }
        )
        data = {
            v: {
                "image": jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32),
                "image_size": jnp.asarray([[64.0, 48.0]]),
            }
            for v in ("view0", "view1")
        }
        variables = pipe.init(jax.random.PRNGKey(0), data)
        pred = pipe.apply(variables, data)
        assert pred["keypoints0"].shape == (1, 64, 2)
        assert pred["matches0"].shape == (1, 64)

    def test_official_configs_load(self):
        from pathlib import Path

        import yaml

        import gluefactory_tpu

        cfg_dir = Path(gluefactory_tpu.__file__).parent / "configs"
        for stem in ("disk+lightglue-official", "loftr-official"):
            conf = yaml.safe_load((cfg_dir / f"{stem}.yaml").read_text())
            assert conf["model"]["name"] == "two_view_pipeline", stem


# --------------------------------------------------------------------------- #
# torch replica: official LoFTR (ResNetFPN_8_2 + linear-attention LoFTR)
# --------------------------------------------------------------------------- #
def _conv3(i, o, s=1):
    return nn.Conv2d(i, o, 3, s, 1, bias=False)


def _conv1(i, o, s=1):
    return nn.Conv2d(i, o, 1, s, 0, bias=False)


class _BasicBlock(nn.Module):
    def __init__(self, i, o, s):
        super().__init__()
        self.conv1 = _conv3(i, o, s)
        self.conv2 = _conv3(o, o)
        self.bn1 = nn.BatchNorm2d(o)
        self.bn2 = nn.BatchNorm2d(o)
        if s != 1:
            self.downsample = nn.Sequential(_conv1(i, o, s), nn.BatchNorm2d(o))
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class _TorchResNetFPN(nn.Module):
    def __init__(self, initial=128, bd=(128, 196, 256)):
        super().__init__()
        self.conv1 = nn.Conv2d(1, initial, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(initial)
        self.layer1 = nn.Sequential(_BasicBlock(initial, bd[0], 1),
                                    _BasicBlock(bd[0], bd[0], 1))
        self.layer2 = nn.Sequential(_BasicBlock(bd[0], bd[1], 2),
                                    _BasicBlock(bd[1], bd[1], 1))
        self.layer3 = nn.Sequential(_BasicBlock(bd[1], bd[2], 2),
                                    _BasicBlock(bd[2], bd[2], 1))
        self.layer3_outconv = _conv1(bd[2], bd[2])
        self.layer2_outconv = _conv1(bd[1], bd[2])
        self.layer2_outconv2 = nn.Sequential(
            _conv3(bd[2], bd[2]), nn.BatchNorm2d(bd[2]), nn.LeakyReLU(),
            _conv3(bd[2], bd[1]))
        self.layer1_outconv = _conv1(bd[0], bd[1])
        self.layer1_outconv2 = nn.Sequential(
            _conv3(bd[1], bd[1]), nn.BatchNorm2d(bd[1]), nn.LeakyReLU(),
            _conv3(bd[1], bd[0]))

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_2x = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_2x)
        x2_2x = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_2x)
        return x1_out, x3_out  # fine 1/2, coarse 1/8


class _TorchLoFTREncoderLayer(nn.Module):
    def __init__(self, d, nhead):
        super().__init__()
        self.dim = d // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d, d, bias=False)
        self.k_proj = nn.Linear(d, d, bias=False)
        self.v_proj = nn.Linear(d, d, bias=False)
        self.merge = nn.Linear(d, d, bias=False)
        self.mlp = nn.Sequential(nn.Linear(2 * d, 2 * d, bias=False),
                                 nn.ReLU(True), nn.Linear(2 * d, d, bias=False))
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        q = F.elu(q) + 1
        k = F.elu(k) + 1
        v_len = v.size(1)
        values = v / v_len
        kv = torch.einsum("nshd,nshv->nhdv", k, values)
        z = 1.0 / (torch.einsum("nlhd,nhd->nlh", q, k.sum(1)) + 1e-6)
        msg = torch.einsum("nlhd,nhdv,nlh->nlhv", q, kv, z) * v_len
        msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.norm2(self.mlp(torch.cat([x, msg], 2)))
        return x + msg


class _TorchLFT(nn.Module):  # LocalFeatureTransformer
    def __init__(self, d, nhead, n_pairs):
        super().__init__()
        self.layers = nn.ModuleList(
            [_TorchLoFTREncoderLayer(d, nhead) for _ in range(2 * n_pairs)]
        )

    def forward(self, t0, t1):
        for i, layer in enumerate(self.layers):
            if i % 2 == 0:
                t0 = layer(t0, t0)
                t1 = layer(t1, t1)
            else:
                n0 = layer(t0, t1)
                t1 = layer(t1, t0)
                t0 = n0
        return t0, t1


class _TorchFinePreprocess(nn.Module):
    def __init__(self, dc=256, df=128):
        super().__init__()
        self.down_proj = nn.Linear(dc, df, bias=True)
        self.merge_feat = nn.Linear(2 * df, df, bias=True)


class TorchLoFTR(nn.Module):
    def __init__(self, n_coarse=4, n_fine=1):
        super().__init__()
        self.backbone = _TorchResNetFPN()
        self.loftr_coarse = _TorchLFT(256, 8, n_coarse)
        self.fine_preprocess = _TorchFinePreprocess()
        self.loftr_fine = _TorchLFT(128, 8, n_fine)


def _randomize_bn_stats(module, rng):
    """Non-trivial running stats so the converter's BN fold is exercised."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.tensor(
                0.5 + rng.rand(m.num_features).astype(np.float32)))


class TestLoFTRWeightParity:
    def _build(self):
        from gluefactory_tpu.models.matchers.loftr_official import (
            position_encoding_sine,
        )
        from gluefactory_tpu.scripts.convert_weights import convert_loftr

        torch.manual_seed(11)
        net = TorchLoFTR().eval()
        rng = np.random.RandomState(13)
        with torch.no_grad():
            _randomize_bn_stats(net, rng)
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
              if "num_batches_tracked" not in k}
        tree = convert_loftr(sd)
        model = get_model("loftr_official").from_conf({"max_num_matches": 16})
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        return net, model, variables, position_encoding_sine

    def test_param_tree_shapes_match_model(self):
        net, model, variables, _ = self._build()
        init = model.init(
            jax.random.PRNGKey(0),
            {"view0": {"image": jnp.zeros((1, 32, 32, 1))},
             "view1": {"image": jnp.zeros((1, 32, 32, 1))}},
        )
        want = jax.tree_util.tree_map(lambda x: x.shape, init["params"])
        got = jax.tree_util.tree_map(
            lambda x: np.asarray(x).shape, variables["params"]
        )
        assert want == got, f"{want}\nvs\n{got}"

    def test_coarse_matrix_and_fine_refinement_match_torch(self):
        net, model, variables, pe_fn = self._build()
        rng = np.random.RandomState(7)
        img0 = rng.rand(1, 64, 64, 1).astype(np.float32)
        img1 = rng.rand(1, 64, 64, 1).astype(np.float32)

        pred = model.apply(
            variables,
            {"view0": {"image": jnp.asarray(img0)},
             "view1": {"image": jnp.asarray(img1)}},
        )

        # torch side, same math end to end
        t0i = torch.tensor(img0.transpose(0, 3, 1, 2))
        t1i = torch.tensor(img1.transpose(0, 3, 1, 2))
        with torch.no_grad():
            f0, c0 = net.backbone(t0i)
            f1, c1 = net.backbone(t1i)
            hc, wc = c0.shape[2:]
            pe = torch.tensor(
                np.asarray(pe_fn(256, hc, wc)).transpose(2, 0, 1)
            )[None]
            t0 = (c0 + pe).flatten(2).transpose(1, 2)
            t1 = (c1 + pe).flatten(2).transpose(1, 2)
            t0, t1 = net.loftr_coarse(t0, t1)
            s0 = t0 / 256**0.5
            s1 = t1 / 256**0.5
            sim = torch.einsum("nlc,nsc->nls", s0, s1) / 0.1
            conf = F.softmax(sim, 1) * F.softmax(sim, 2)
        np.testing.assert_allclose(
            np.asarray(pred["coarse_matrix"]), conf.numpy(), atol=5e-4
        )

        # fine refinement on OUR selected cells, replicated in torch
        topi = np.asarray(pred["keypoints0"][0] / 8.0).astype(int)
        topi = topi[:, 1] * wc + topi[:, 0]
        j = np.asarray(pred["keypoints1"][0])  # refined; recover cells below
        with torch.no_grad():
            best1 = conf[0].argmax(-1).numpy()
            jcell = best1[topi]
            W = 5
            unfold = lambda f: F.unfold(f, kernel_size=(W, W), stride=4,
                                        padding=2)
            wf0 = unfold(f0).view(1, 128, W * W, -1)[0].permute(2, 1, 0)
            wf1 = unfold(f1).view(1, 128, W * W, -1)[0].permute(2, 1, 0)
            w0 = wf0[topi]  # (K, WW, C)
            w1 = wf1[jcell]
            g0 = net.fine_preprocess.down_proj(t0[0][topi])
            g1 = net.fine_preprocess.down_proj(t1[0][jcell])
            cat = lambda wf, g: net.fine_preprocess.merge_feat(
                torch.cat([wf, g[:, None].expand(-1, W * W, -1)], -1)
            )
            w0, w1 = cat(w0, g0), cat(w1, g1)
            w0, w1 = net.loftr_fine(w0, w1)
            center = w0[:, W * W // 2]
            simf = torch.einsum("mc,mrc->mr", center, w1) / 128**0.5
            heat = F.softmax(simf, 1).view(-1, W, W)
            gy, gx = torch.meshgrid(
                torch.linspace(-1, 1, W), torch.linspace(-1, 1, W),
                indexing="ij",
            )
            ex = (heat * gx).sum((1, 2))
            ey = (heat * gy).sum((1, 2))
            kx = (jcell % wc) * 8 + ex.numpy() * (W // 2) * 2
            ky = (jcell // wc) * 8 + ey.numpy() * (W // 2) * 2
        np.testing.assert_allclose(j[:, 0], kx, atol=5e-3)
        np.testing.assert_allclose(j[:, 1], ky, atol=5e-3)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS_DIR, "outdoor_ds.ckpt")),
    reason="outdoor_ds.ckpt not on disk (zero-egress env); place the official "
    "LoFTR checkpoint under $GLUEFACTORY_TPU_WEIGHTS to smoke the converter",
)
class TestLoFTROfficialWeights:
    def test_official_loftr_matches_shifted_pair(self):
        from gluefactory_tpu.scripts.convert_weights import convert_loftr
        from gluefactory_tpu.utils import torch_io

        state = torch_io.load_state_dict(os.path.join(WEIGHTS_DIR, "outdoor_ds.ckpt"))
        state = {k: np.asarray(v) for k, v in state.items()}
        if any(k.startswith("matcher.") for k in state):
            state = {k[len("matcher."):]: v for k, v in state.items()
                     if k.startswith("matcher.")}
        tree = convert_loftr(state)
        model = get_model("loftr_official").from_conf({"max_num_matches": 256})
        rng = np.random.RandomState(0)
        base = rng.rand(96, 128, 1).astype(np.float32)
        shift = 8
        img0 = base[:, :-shift]
        img1 = base[:, shift:]
        pred = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])},
            {"view0": {"image": jnp.asarray(img0[None])},
             "view1": {"image": jnp.asarray(img1[None])}},
        )
        valid = np.asarray(pred["keypoint_mask0"][0])
        assert valid.sum() > 20
        k0 = np.asarray(pred["keypoints0"][0])[valid]
        k1 = np.asarray(pred["keypoints1"][0])[valid]
        dx = k0[:, 0] - k1[:, 0]
        assert np.abs(np.median(dx) - shift) < 2.0


@pytest.mark.skipif(
    not os.path.exists(os.path.join(WEIGHTS_DIR, "depth-save.pth")),
    reason="depth-save.pth not on disk (zero-egress env); place the official "
    "DISK checkpoint under $GLUEFACTORY_TPU_WEIGHTS to smoke the converter",
)
class TestDISKOfficialWeights:
    def test_official_disk_detects_and_describes(self):
        from gluefactory_tpu.utils import torch_io

        state = torch_io.load_state_dict(os.path.join(WEIGHTS_DIR, "depth-save.pth"))
        state = {k: np.asarray(v) for k, v in state.items()}
        if any(k.startswith("extractor.") for k in state):
            state = {k[len("extractor."):]: v for k, v in state.items()
                     if k.startswith("extractor.")}
        tree = convert_disk(state)
        model = get_model("disk_official").from_conf({"max_num_keypoints": 512})
        rng = np.random.RandomState(0)
        # textured synthetic image pair related by a known shift
        base = np.repeat(rng.rand(1, 72, 96, 1).astype(np.float32), 3, -1)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])}
        pred = model.apply(variables, {"image": jnp.asarray(base)})
        assert int(np.asarray(pred["keypoint_mask"]).sum()) > 100
        d = np.asarray(pred["descriptors"][0])
        norms = np.linalg.norm(d, axis=-1)
        valid = np.asarray(pred["keypoint_mask"][0])
        np.testing.assert_allclose(norms[valid], 1.0, atol=1e-4)
