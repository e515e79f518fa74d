"""SuperPoint-style self-supervised losses for MultiPoint training.

Counterpart of reference gluefactory/multipoint/utils/losses.py:8-213:
  - detector loss: cell-wise cross-entropy of the 65-way softmax against a
    space-to-depth keypoint label map (+ dustbin when a cell is empty), with
    a validity mask;
  - descriptor loss: dense hinge (contrastive) loss between the two views'
    cell descriptors, positives = cell centers within `descriptor_loss_
    threshold` pixels after warping by the pair homography
    (lambda_d-weighted positive margin / negative margin).

All batched JAX; masks replace the reference's in-place indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geometry.homography import warp_points


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W) -> (B, H/r, W/r, r*r) cell unfolding."""
    b, h, w = x.shape
    x = x.reshape(b, h // r, r, w // r, r)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h // r, w // r, r * r)


def detector_loss(
    logits: jnp.ndarray, keypoint_map: jnp.ndarray, valid_mask=None, cell: int = 8
) -> jnp.ndarray:
    """Cell-wise CE over 65 classes (reference losses.py:87-141).

    logits: (B, Hc, Wc, cell^2+1); keypoint_map: (B, H, W) binary.
    """
    labels_cells = space_to_depth(keypoint_map.astype(jnp.float32), cell)
    b, hc, wc, c2 = labels_cells.shape
    # add the dustbin: slight bias so empty cells pick the bin (ref adds 1s
    # channel then argmax with random tie-break; deterministic here)
    dustbin = jnp.ones((b, hc, wc, 1)) * 0.5
    full = jnp.concatenate([labels_cells * 2.0, dustbin], axis=-1)
    labels = jnp.argmax(full, axis=-1)

    ce = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), labels[..., None], axis=-1
    )[..., 0]
    if valid_mask is not None:
        cell_valid = space_to_depth(valid_mask.astype(jnp.float32), cell).min(-1)
        ce = ce * cell_valid
        return ce.sum((-1, -2)) / jnp.maximum(cell_valid.sum((-1, -2)), 1.0)
    return ce.mean((-1, -2))


def descriptor_loss(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    H_0to1: jnp.ndarray,
    valid_mask1=None,
    cell: int = 8,
    pos_margin: float = 1.0,
    neg_margin: float = 0.2,
    lambda_d: float = 250.0,
    threshold: float = 8.0,
):
    """Dense hinge descriptor loss (reference losses.py:143-213).

    desc: (B, Hc, Wc, D) cell descriptors of each view; positives are cell
    pairs whose view-0 center warps within `threshold` px of the view-1
    center. Returns (loss (B,), positive_dist, negative_dist).
    """
    b, hc, wc, d = desc0.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(hc, dtype=jnp.float32), jnp.arange(wc, dtype=jnp.float32),
        indexing="ij",
    )
    centers = jnp.stack([xs, ys], -1).reshape(1, -1, 2) * cell + cell / 2  # (1, N, 2)
    centers = jnp.broadcast_to(centers, (b, hc * wc, 2))
    warped0 = warp_points(centers, H_0to1)  # view0 centers in view1 frame

    dist = jnp.linalg.norm(
        warped0[:, :, None, :] - centers[:, None, :, :], axis=-1
    )  # (B, N0, N1)
    s = (dist <= threshold).astype(jnp.float32)

    d0 = desc0.reshape(b, -1, d)
    d1 = desc1.reshape(b, -1, d)
    dot = jnp.einsum("bnd,bmd->bnm", d0, d1, preferred_element_type=jnp.float32)

    pos = jnp.maximum(0.0, pos_margin - dot)
    neg = jnp.maximum(0.0, dot - neg_margin)
    per_pair = lambda_d * s * pos + (1.0 - s) * neg

    if valid_mask1 is not None:
        cell_valid = space_to_depth(valid_mask1.astype(jnp.float32), cell).min(-1)
        w1 = cell_valid.reshape(b, 1, -1)
        per_pair = per_pair * w1
        # norm must be (B,): a (B,1) norm silently broadcasts the (B,) sum
        # into a (B,B) loss, coupling sample j's loss to sample i's valid
        # count (ADVICE r3)
        norm = jnp.maximum(cell_valid.reshape(b, -1).sum(-1), 1.0) * (hc * wc)
    else:
        norm = jnp.asarray(float(hc * wc) ** 2)
    loss = per_pair.sum((-1, -2)) / norm
    assert loss.shape == (b,), loss.shape
    pos_dist = (s * dot).sum((-1, -2)) / jnp.maximum(s.sum((-1, -2)), 1.0)
    neg_dist = ((1 - s) * dot).sum((-1, -2)) / jnp.maximum((1 - s).sum((-1, -2)), 1.0)
    return loss, pos_dist, neg_dist


def superpoint_loss(pred, data, conf) -> tuple:
    """Combined detector (+ optional paired descriptor) loss used by
    MultiPoint.loss. Expects data: keypoint_map (B,H,W), valid_mask,
    optionally pred2/data2-style second-view keys with H_0to1."""
    losses = {}
    det = detector_loss(
        pred["logits"], data["keypoint_map"], data.get("valid_mask"),
        cell=conf.get("cell", 8),
    )
    losses["detector_loss"] = det
    total = det
    if "logits2" in pred:
        det2 = detector_loss(
            pred["logits2"], data["keypoint_map2"], data.get("valid_mask2"),
            cell=conf.get("cell", 8),
        )
        losses["detector_loss2"] = det2
        total = total + det2
    if "dense_descriptors" in pred and "dense_descriptors2" in pred:
        dl, pd, nd = descriptor_loss(
            pred["dense_descriptors"], pred["dense_descriptors2"],
            data["H_0to1"], data.get("valid_mask2"), cell=conf.get("cell", 8),
        )
        losses["descriptor_loss"] = dl
        losses["positive_dist"] = pd
        losses["negative_dist"] = nd
        total = total + 1e-4 * dl
    losses["total"] = total
    return losses, {}


__all__ = ["space_to_depth", "detector_loss", "descriptor_loss", "superpoint_loss"]
