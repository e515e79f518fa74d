"""HomographyNet: direct 4-point homography regression from an image pair.

Counterpart of reference gluefactory/multipoint/models/HomographyNet.py (the
DeTone-style regressor used as XPoint's optional homography head): the two
grayscale views are stacked channel-wise, a conv tower pools them to a global
feature, and an MLP regresses the 8 corner-offset values of the 4-point
homography parameterization.

Loss: L2 on corner offsets against `H_0to1` converted to 4-point form (the
reference net ships without a loss; training code supervises the offsets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.base_model import BaseModel


def h_to_4pt(H: jnp.ndarray, size) -> jnp.ndarray:
    """(B, 3, 3) homography -> (B, 4, 2) corner displacements for an image of
    (w, h) `size` (the 4-point parameterization)."""
    w, h = size
    corners = jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]]
    )
    ones = jnp.ones((4, 1))
    pts = jnp.concatenate([corners, ones], axis=-1)  # (4, 3)
    warped = jnp.einsum("bij,nj->bni", H, pts)
    warped = warped[..., :2] / warped[..., 2:]
    return warped - corners[None]


class CorrelationHomographyHead(nn.Module):
    """SRHEN-style head (reference SRHENNet/SRHENLighterNet): a global
    correlation volume between the two 1/8 feature maps, convolved down and
    regressed to 4-point offsets. `width` scales channels (the 'Lighter'
    variant is width=0.5)."""

    width: float = 1.0

    @nn.compact
    def __call__(self, f0, f1):
        b, h, w, c = f0.shape
        t0 = f0.reshape(b, h * w, c)
        t1 = f1.reshape(b, h * w, c)
        t0 = t0 / (jnp.linalg.norm(t0, axis=-1, keepdims=True) + 1e-8)
        t1 = t1 / (jnp.linalg.norm(t1, axis=-1, keepdims=True) + 1e-8)
        corr = jnp.einsum(
            "bnc,bmc->bnm", t0, t1, preferred_element_type=jnp.float32
        ).reshape(b, h, w, h * w)
        ch = int(128 * self.width)
        x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(corr)
        x = nn.relu(x)
        x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.relu(x)
        y = nn.Dense(int(256 * self.width))(x.mean(axis=(1, 2)))
        y = nn.relu(y)
        return nn.Dense(8)(y).reshape(-1, 4, 2)


class CrossAttentionHomographyHead(nn.Module):
    """MS2CAHE-style head: tokens of view0 cross-attend into view1 (and
    vice versa); pooled attended features regress the offsets."""

    dim: int = 128
    heads: int = 4

    @nn.compact
    def __call__(self, f0, f1):
        b, h, w, c = f0.shape
        t0 = nn.Dense(self.dim)(f0.reshape(b, h * w, c))
        t1 = nn.Dense(self.dim)(f1.reshape(b, h * w, c))
        dh = self.dim // self.heads

        def attend(q, kv):
            qh = nn.Dense(self.dim)(q).reshape(b, -1, self.heads, dh)
            kh = nn.Dense(self.dim)(kv).reshape(b, -1, self.heads, dh)
            vh = nn.Dense(self.dim)(kv).reshape(b, -1, self.heads, dh)
            attn = jax.nn.softmax(
                jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                           preferred_element_type=jnp.float32) / dh**0.5, -1)
            o = jnp.einsum("bhnm,bmhd->bnhd", attn, vh)
            return o.reshape(b, -1, self.dim)

        a0 = attend(t0, t1).mean(axis=1)
        a1 = attend(t1, t0).mean(axis=1)
        y = nn.Dense(self.dim)(jnp.concatenate([a0, a1], axis=-1))
        y = nn.relu(y)
        return nn.Dense(8)(y).reshape(-1, 4, 2)


class HomographyNet(BaseModel):
    default_conf = {
        "name": "homography_net",
        "channels": [64, 64, 128, 128],
        "fc_dim": 128,
        "is_training": False,
        "loss": {"weight": 1.0},
    }
    required_data_keys = ["view0", "view1"]

    @nn.compact
    def __call__(self, data: dict) -> dict:
        self.check_required_keys(data)
        im0, im1 = data["view0"]["image"], data["view1"]["image"]
        if im0.shape[-1] == 3:
            gray = jnp.asarray([0.299, 0.587, 0.114])
            im0 = (im0 @ gray)[..., None]
            im1 = (im1 @ gray)[..., None]
        x = jnp.concatenate([im0, im1], axis=-1)  # (B, H, W, 2)
        for i, c in enumerate(self.conf.channels):
            x = nn.Conv(c, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(
                use_running_average=not self.conf.is_training, epsilon=1e-3
            )(x)
            x = nn.relu(x)
            if i < len(self.conf.channels) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feat = x.mean(axis=(1, 2))  # global average pool
        y = nn.Dense(self.conf.fc_dim)(feat)
        y = nn.relu(y)
        offsets = nn.Dense(8)(y).reshape(-1, 4, 2)
        return {"h_4pt": offsets}

    def loss(self, pred, data):
        w, h = data["view0"]["image"].shape[2], data["view0"]["image"].shape[1]
        gt = h_to_4pt(data["H_0to1"], (w, h))
        err = jnp.mean(jnp.sum((pred["h_4pt"] - gt) ** 2, axis=-1), axis=-1)
        total = self.conf.loss["weight"] * err
        corner_err = jnp.mean(
            jnp.linalg.norm(pred["h_4pt"] - gt, axis=-1), axis=-1
        )
        return {"h4pt": err, "total": total}, {"corner_error": corner_err}


__main_model__ = HomographyNet
