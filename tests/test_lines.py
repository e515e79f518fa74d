"""DeepLSD hermetic quality loop (VERDICT r2 weak #8: native re-architectures
must be PROVEN trainable, not just runnable).

Trains the native DeepLSD U-Net on synthetic line images with exact GT
distance/angle fields (`gt_line_fields`), then pushes the trained fields
through the full host segment-extraction path and asserts the drawn segments
are recovered. Reference counterpart: models/lines/deeplsd.py only wraps a
pretrained external net; the training objective here follows the DeepLSD
paper's field supervision.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.lines.deeplsd import gt_line_fields

H, W = 96, 128
MAX_LINES = 6


def make_line_batch(rng: np.random.RandomState, b: int):
    """Dark noisy background + bright segments of known geometry."""
    images = np.zeros((b, H, W, 1), np.float32)
    lines = np.zeros((b, MAX_LINES, 2, 2), np.float32)
    mask = np.zeros((b, MAX_LINES), bool)
    for i in range(b):
        img = rng.uniform(0.0, 0.15, (H, W)).astype(np.float32)
        n = rng.randint(3, MAX_LINES + 1)
        for j in range(n):
            while True:
                p0 = np.array([rng.randint(W), rng.randint(H)], np.float32)
                p1 = np.array([rng.randint(W), rng.randint(H)], np.float32)
                if np.linalg.norm(p1 - p0) >= 40:
                    break
            cv2.line(
                img,
                (int(p0[0]), int(p0[1])),
                (int(p1[0]), int(p1[1])),
                float(rng.uniform(0.8, 1.0)),
                2,
            )
            lines[i, j] = np.stack([p0, p1])
            mask[i, j] = True
        images[i, ..., 0] = img
    return images, lines, mask


@pytest.fixture(scope="module")
def trained():
    rng = np.random.RandomState(7)
    images, lines, mask = make_line_batch(rng, b=6)
    gt_df, gt_angle = gt_line_fields(lines, mask, (H, W), max_dist=5.0)
    data = {
        "image": jnp.asarray(images),
        "gt_df": jnp.asarray(gt_df),
        "gt_angle": jnp.asarray(gt_angle),
    }
    model = get_model("deeplsd").from_conf(
        {"channels": [8, 16, 32], "extract_segments": False}
    )
    params = model.init(jax.random.PRNGKey(0), data)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, data)
            losses, _ = model.apply(p, pred, data, method="loss")
            return losses["total"].mean(), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, losses

    first = None
    for it in range(220):
        params, opt_state, losses = step(params, opt_state)
        if first is None:
            first = {k: float(v.mean()) for k, v in losses.items()}
    last = {k: float(v.mean()) for k, v in losses.items()}
    return model, params, data, (images, lines, mask), first, last


class TestDeepLSDQualityLoop:
    def test_field_losses_converge(self, trained):
        _, _, _, _, first, last = trained
        assert last["total"] < 0.5 * first["total"], (first, last)
        assert last["df"] < 0.12, last  # r-normalized L1; 0.12 ≈ 0.6 px
        assert last["angle"] < 0.35, last

    def test_df_accurate_near_lines(self, trained):
        model, params, data, _, _, _ = trained
        pred = model.apply(params, data)
        df = np.asarray(pred["df"])
        gt = np.asarray(data["gt_df"])
        near = gt < 4.0
        err = np.abs(np.minimum(df, 5.0) - gt)[near]
        assert err.mean() < 1.0, err.mean()

    def test_angle_accurate_on_lines(self, trained):
        model, params, data, _, _, _ = trained
        pred = model.apply(params, data)
        ang = np.asarray(pred["line_level"])
        gt = np.asarray(jnp.arctan2(jnp.sin(2 * data["gt_angle"]),
                                    jnp.cos(2 * data["gt_angle"])) / 2)
        on = np.asarray(data["gt_df"]) < 1.5
        # angular distance mod pi
        d = np.abs(ang - gt)[on]
        d = np.minimum(d, np.pi - d)
        assert np.median(d) < 0.15, np.median(d)  # < ~9 degrees

    def test_extraction_recovers_segments(self, trained):
        model, params, _, (images, lines, mask), _, _ = trained
        infer = get_model("deeplsd").from_conf(
            {"channels": [8, 16, 32], "extract_segments": True,
             "min_length": 20.0, "df_threshold": 2.0}
        )
        out = infer.apply(params, {"image": jnp.asarray(images[:4])})
        pred_lines = np.asarray(out["lines"])
        pred_mask = np.asarray(out["line_mask"])
        recalls = []
        for i in range(4):
            segs = pred_lines[i][pred_mask[i]]
            gt_segs = lines[i][mask[i]]
            if len(segs) == 0:
                recalls.append(0.0)
                continue
            # sample points along each GT segment, distance to nearest pred seg
            t = np.linspace(0, 1, 16)[:, None]
            pts = (gt_segs[:, None, 0] * (1 - t) + gt_segs[:, None, 1] * t).reshape(-1, 2)
            a, b = segs[:, 0], segs[:, 1]
            ab = b - a
            denom = np.maximum((ab * ab).sum(-1), 1e-8)
            ap = pts[:, None] - a[None]
            tt = np.clip((ap * ab[None]).sum(-1) / denom[None], 0, 1)
            closest = a[None] + tt[..., None] * ab[None]
            d = np.linalg.norm(pts[:, None] - closest, axis=-1).min(-1)
            recalls.append(float((d < 4.0).mean()))
        assert np.mean(recalls) > 0.5, recalls
