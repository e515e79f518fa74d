"""CacheLoader: a model that loads cached predictions from HDF5 by sample name.

Counterpart of reference gluefactory/models/cache_loader.py:13-142: reads a
per-sample group from an HDF5 file (path given by a format string over the
conf), optionally casts dtypes, rescales keypoints by view scales, and pads
variable-length features to a fixed size with a validity mask (our
`pad_local_features` equivalent — mandatory on TPU).

This is a host-side component (h5py I/O): it runs in the data pipeline or the
eval driver, not under jit.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from ..settings import DATA_PATH
from ..utils.config import FrozenConfig, merge


def pad_local_features(pred: dict, n: int) -> dict:
    """Pad keypoints/scores/descriptors to n with a keypoint_mask."""
    out = dict(pred)
    k = pred["keypoints"]
    cur = k.shape[-2]
    mask = np.zeros(n, bool)
    mask[: min(cur, n)] = True
    if "keypoint_mask" in pred:  # keep invalid slots from an already-padded cache
        mask[: min(cur, n)] &= pred["keypoint_mask"].astype(bool)[: min(cur, n)]
    out["keypoint_mask"] = mask

    def pad(x, fill=0.0):
        if x.shape[0] >= n:
            return x[:n]
        pad_shape = (n - x.shape[0],) + x.shape[1:]
        return np.concatenate([x, np.full(pad_shape, fill, x.dtype)], 0)

    for key in list(out.keys()):
        if key in ("keypoints", "descriptors", "keypoint_scores", "scales", "oris",
                   "depth_keypoints", "valid_depth_keypoints"):
            out[key] = pad(out[key])
    return out


class CacheLoader:
    default_conf = {
        "name": "cache_loader",
        "path": None,  # format string, e.g. "exports/{scene}.h5"
        "data_keys": None,  # subset of keys to load, None = all
        "device": None,
        "trainable": False,
        "add_data_path": True,
        "collate": True,
        "scale": ["keypoints", "lines", "orig_lines"],
        "padding_length": None,
        "numeric_type": "float32",
    }

    def __init__(self, conf=None):
        self.conf = FrozenConfig(merge(self.default_conf, conf or {}))
        self._files: dict = {}

    def _file(self, path: str) -> h5py.File:
        if path not in self._files:
            p = Path(path)
            if self.conf.add_data_path and not p.is_absolute():
                p = Path(DATA_PATH) / p
            self._files[path] = h5py.File(str(p), "r")
        return self._files[path]

    def __call__(self, data: dict) -> dict:
        """data must contain 'name' (str) and optionally format-string fields
        used by conf.path; returns the cached prediction dict."""
        path = self.conf.path.format(**{k: v for k, v in data.items() if isinstance(v, str)})
        hfile = self._file(path)
        grp = hfile[str(data["name"])]
        pred = {}
        keys = self.conf.data_keys or list(grp.keys())
        for k in keys:
            if k not in grp:
                continue
            v = np.asarray(grp[k])
            if v.dtype.kind == "f" and self.conf.numeric_type:
                v = v.astype(self.conf.numeric_type)
            pred[k] = v
        # rescale cached keypoints into the current view resolution
        if "scales" in data:
            s = np.asarray(data["scales"])
            for k in self.conf.scale:
                if k in pred:
                    pred[k] = pred[k] * s[None, :] if pred[k].ndim == 2 else pred[k] * s
        if self.conf.padding_length:
            pred = pad_local_features(pred, int(self.conf.padding_length))
        return pred

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


__all__ = ["CacheLoader", "pad_local_features"]
