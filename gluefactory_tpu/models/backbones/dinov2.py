"""ViT backbone with the DINOv2 interface.

Counterpart of reference models/backbones/dinov2.py:7-30 (torch.hub DINOv2:
dense patch features + cls token as global descriptor). torch.hub is
unavailable in zero-egress environments; this is a native flax ViT with the
same interface — patch embedding, pre-norm transformer blocks, cls token —
sized like ViT-S/14 by default. Pretrained DINOv2 weights can be converted
into this parameter layout offline.

Outputs: features (B, Hp, Wp, D) dense patch features, global_descriptor
(B, D) cls token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..base_model import BaseModel


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(y, y)
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.Dense(4 * self.dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class DinoV2(BaseModel):
    default_conf = {
        "name": "dinov2",
        "weights": "dinov2_vits14",  # interface compat; converted weights path
        "patch_size": 14,
        "embed_dim": 384,
        "depth": 6,  # ViT-S is 12; compact default for from-scratch use
        "num_heads": 6,
        "allow_resize": True,
    }
    required_data_keys = ["image"]

    @nn.compact
    def __call__(self, data):
        self.check_required_keys(data)
        conf = self.conf
        img = data["image"]
        if img.shape[-1] == 1:
            img = jnp.repeat(img, 3, -1)
        b, h, w, _ = img.shape
        p = conf.patch_size
        if conf.allow_resize and (h % p or w % p):
            h2, w2 = (h // p) * p, (w // p) * p
            img = jax.image.resize(img, (b, max(h2, p), max(w2, p), 3), "bilinear")
            h, w = img.shape[1:3]

        x = nn.Conv(conf.embed_dim, (p, p), strides=(p, p), name="patch_embed")(img)
        hp, wp = x.shape[1:3]
        tokens = x.reshape(b, hp * wp, conf.embed_dim)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, conf.embed_dim)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, hp * wp + 1, conf.embed_dim)
        )
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, conf.embed_dim)), tokens], 1)
        tokens = tokens + pos
        for i in range(conf.depth):
            tokens = _Block(conf.embed_dim, conf.num_heads, name=f"block_{i}")(tokens)
        tokens = nn.LayerNorm()(tokens)
        return {
            "features": tokens[:, 1:].reshape(b, hp, wp, conf.embed_dim),
            "global_descriptor": tokens[:, 0],
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = DinoV2
