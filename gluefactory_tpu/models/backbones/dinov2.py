"""DINOv2 ViT backbone, weight-compatible.

Counterpart of reference models/backbones/dinov2.py:7-30 (torch.hub DINOv2:
dense patch features + cls token as global descriptor). torch.hub is
unavailable in zero-egress environments; this is a native flax implementation
of the DINOv2 architecture — 14x14 patch embedding, cls token, learned
position embeddings on a fixed native grid with bicubic interpolation to the
runtime grid, pre-norm blocks with LayerScale, exact-GELU MLP — whose
parameters load from converted official checkpoints
(scripts/convert_weights.py --kind dinov2, HuggingFace Dinov2Model state
dicts; numerically verified against the in-env `transformers`
implementation in tests/test_convert_weights.py).

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
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        d, h = self.dim, self.heads
        dh = d // h
        y = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(d, name="q")(y)
        k = nn.Dense(d, name="k")(y)
        v = nn.Dense(d, name="v")(y)
        b, n, _ = y.shape
        split = lambda t: t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        att = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) / dh**0.5, axis=-1
        )
        ctx = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
        ctx = nn.Dense(d, name="proj")(ctx)
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (d,))
        x = x + ctx * ls1
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.mlp_ratio * d, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, name="fc2")(y)
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (d,))
        return x + y * ls2


class DinoV2(BaseModel):
    default_conf = {
        "name": "dinov2",
        "weights": None,  # converted .npz of an official checkpoint
        "patch_size": 14,
        "embed_dim": 384,  # ViT-S/14
        "depth": 12,
        "num_heads": 6,
        # native position-embedding grid (official checkpoints: 518/14 = 37);
        # other runtime grids interpolate bicubically like upstream
        "pos_grid": 37,
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

        d = conf.embed_dim
        x = nn.Conv(d, (p, p), strides=(p, p), name="patch_embed")(img)
        hp, wp = x.shape[1:3]
        tokens = x.reshape(b, hp * wp, d)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, d))
        g = int(conf.pos_grid)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, g * g + 1, d)
        )
        if (hp, wp) != (g, g):
            # bicubic interpolation of the patch grid (upstream
            # interpolate_pos_encoding); the cls slot passes through
            patch_pos = pos[:, 1:].reshape(1, g, g, d)
            patch_pos = jax.image.resize(patch_pos, (1, hp, wp, d), "cubic")
            pos_r = jnp.concatenate(
                [pos[:, :1], patch_pos.reshape(1, hp * wp, d)], axis=1
            )
        else:
            pos_r = pos
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), tokens], 1)
        tokens = tokens + pos_r
        for i in range(conf.depth):
            tokens = _Block(d, conf.num_heads, name=f"block_{i}")(tokens)
        tokens = nn.LayerNorm(name="norm")(tokens)
        return {
            "features": tokens[:, 1:].reshape(b, hp, wp, d),
            "global_descriptor": tokens[:, 0],
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = DinoV2
