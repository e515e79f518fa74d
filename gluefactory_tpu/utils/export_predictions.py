"""Export model predictions over a dataset to HDF5.

Counterpart of reference gluefactory/utils/export_predictions.py:17-85: run
the model over a loader, optionally rescale keypoints back to the original
resolution by the view scales, and write one HDF5 group per sample name.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import numpy as np

from .. import logger


def export_predictions(
    loader,
    apply_fn,
    output_file: Path,
    as_half: bool = False,
    keys: str | list = "*",
    callback_fn=None,
    optional_keys: list = (),
):
    """apply_fn(batch) -> pred dict (batched jnp arrays). Writes per-sample
    groups keyed by data["name"]."""
    output_file = Path(output_file)
    output_file.parent.mkdir(exist_ok=True, parents=True)
    with h5py.File(str(output_file), "w") as hfile:
        for data in loader:
            pred = apply_fn(data)
            pred = {k: np.asarray(v) for k, v in pred.items() if hasattr(v, "shape")}
            if callback_fn is not None:
                pred = {**callback_fn(pred, data), **pred}
            if keys != "*":
                if len(set(keys) - set(pred.keys())) > 0:
                    raise ValueError(f"Missing key {set(keys) - set(pred.keys())}")
                pred = {k: v for k, v in pred.items() if k in keys + list(optional_keys)}

            # rescale keypoints to original image resolution (reference :48-66)
            for idx_view in ("0", "1", ""):
                scales_key = f"scales{idx_view}" if idx_view else "scales"
                view = data.get(f"view{idx_view}", data if idx_view == "" else {})
                if isinstance(view, dict) and scales_key in view:
                    scale = np.asarray(view[scales_key])
                    kk = f"keypoints{idx_view}"
                    if kk in pred:
                        pred[kk] = pred[kk] * scale[..., None, :]

            if as_half:
                for k in pred:
                    if pred[k].dtype == np.float32:
                        pred[k] = pred[k].astype(np.float16)

            names = data["name"]
            if isinstance(names, (str, bytes)):
                names = [names]
            for b, name in enumerate(names):
                try:
                    grp = hfile.create_group(str(name))
                except ValueError:
                    logger.warning("Duplicate sample name %s, skipping", name)
                    continue
                for k, v in pred.items():
                    grp.create_dataset(k, data=v[b])
    logger.info("Saved predictions to %s", output_file)
    return output_file


__all__ = ["export_predictions"]
