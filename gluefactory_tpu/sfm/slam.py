"""Minimal incremental SfM/SLAM driver.

End-to-end composition of the framework's layers (the BASELINE north star):
per keyframe, extract features (any registered extractor), match against the
previous keyframe (any matcher), estimate relative pose with the batched
E-RANSAC, resolve the monocular scale against the existing map, triangulate
new landmarks, and periodically refine the active window with the
Schur-complement bundle adjustment. Evaluation: ATE vs ground truth.

This is a single-process driver; the heavy stages (matching, RANSAC, BA) are
the jitted batched TPU programs — pair-parallel matching across chips uses
the same mesh axis as training (parallel/mesh.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..estimators.ransac import ransac_relative_pose_jit
from ..geometry.wrappers import Camera, Pose
from .ba import BAProblem, bundle_adjust
from .metrics import absolute_trajectory_error, camera_centers
from .triangulation import triangulate_dlt


@dataclass
class Keyframe:
    idx: int
    R: np.ndarray  # world->cam
    t: np.ndarray
    kpts: np.ndarray  # (N, 2)
    desc: np.ndarray  # (N, D)
    mask: np.ndarray  # (N,)


@dataclass
class SlamState:
    keyframes: list = field(default_factory=list)
    # landmark tracks: world point + per-keyframe observations
    X: list = field(default_factory=list)  # (3,) each
    obs: list = field(default_factory=list)  # list of {kf_idx: uv}


class IncrementalSlam:
    def __init__(self, camera: Camera, matcher_fn, conf=None):
        """matcher_fn(desc0, desc1, kpts0, kpts1, masks...) -> matches0 (N,)"""
        self.camera = camera
        self.matcher_fn = matcher_fn
        conf = conf or {}
        self.ransac_th_px = conf.get("ransac_th", 1.0)
        self.ba_window = conf.get("ba_window", 8)
        self.ba_every = conf.get("ba_every", 4)
        self.max_track_obs = conf.get("max_track_obs", 8)
        self.state = SlamState()
        self._kp_to_track: list = []  # per keyframe: dict kp_idx -> track_idx

    # ------------------------------------------------------------------ steps
    def add_keyframe(self, kpts, desc, mask, gt_pose=None):
        state = self.state
        cam = self.camera
        if not state.keyframes:
            kf = Keyframe(0, np.eye(3), np.zeros(3), kpts, desc, mask)
            state.keyframes.append(kf)
            self._kp_to_track.append({})
            return kf

        prev = state.keyframes[-1]
        matches0 = np.asarray(self.matcher_fn(prev, kpts, desc, mask))
        valid = matches0 >= 0
        if valid.sum() < 16:
            logger.warning("Keyframe %d: too few matches", len(state.keyframes))
            valid = matches0 >= -1  # degrade gracefully

        m_prev = np.where(valid)[0]
        m_cur = matches0[m_prev]
        p0 = prev.kpts[m_prev]
        p1 = kpts[m_cur]

        p0n = np.asarray(cam.normalize(jnp.asarray(p0[None])))[0]
        p1n = np.asarray(cam.normalize(jnp.asarray(p1[None])))[0]
        f_mean = float(np.mean(np.asarray(cam.f)))
        pad = -(-len(p0n) // 256) * 256 - len(p0n)
        p0n_p = np.pad(p0n, ((0, pad), (0, 0)))
        p1n_p = np.pad(p1n, ((0, pad), (0, 0)))
        vmask = np.pad(np.ones(len(p0n), bool), (0, pad))
        res = ransac_relative_pose_jit(
            jnp.asarray(p0n_p), jnp.asarray(p1n_p), jnp.asarray(vmask),
            jax.random.PRNGKey(len(state.keyframes)),
            th=jnp.float32(self.ransac_th_px / f_mean),
        )
        R_rel = np.asarray(res.R)
        t_rel = np.asarray(res.t)
        inliers = np.asarray(res.inliers)[: len(p0n)]

        # resolve monocular scale against existing landmarks seen in prev
        scale = self._resolve_scale(prev, m_prev, m_cur, kpts, R_rel, t_rel, inliers)
        t_rel = t_rel * scale

        R_new = R_rel @ prev.R
        t_new = R_rel @ prev.t + t_rel
        kf = Keyframe(len(state.keyframes), R_new, t_new, kpts, desc, mask)
        state.keyframes.append(kf)
        self._kp_to_track.append({})

        # extend/create tracks for inlier matches
        self._update_tracks(prev, kf, m_prev[inliers], m_cur[inliers])

        if kf.idx % self.ba_every == 0 and len(state.X) > 32:
            self._run_ba()
        return kf

    def _resolve_scale(self, prev, m_prev, m_cur, kpts, R_rel, t_rel, inliers):
        """Ratio of map depth to fresh two-view depth over shared tracks."""
        cam = self.camera
        tracks = self._kp_to_track[prev.idx]
        shared = [
            (i, j) for i, j in zip(m_prev[inliers], m_cur[inliers]) if i in tracks
        ]
        if len(shared) < 8 or not self.state.X:
            return 1.0
        # depth of the mapped points in prev's frame
        idxs = [tracks[i] for i, _ in shared]
        Xw = np.stack([self.state.X[t] for t in idxs])
        z_map = (Xw @ prev.R.T + prev.t)[:, 2]
        # two-view triangulated depth with |t_rel| = 1
        p0 = prev.kpts[[i for i, _ in shared]]
        p1 = kpts[[j for _, j in shared]]
        p0n = np.asarray(cam.normalize(jnp.asarray(p0[None])))[0]
        p1n = np.asarray(cam.normalize(jnp.asarray(p1[None])))[0]
        rays = np.stack([p0n, p1n], axis=1)  # (S, 2, 2)
        Rs = np.stack([np.broadcast_to(np.eye(3), (len(shared), 3, 3)),
                       np.broadcast_to(R_rel, (len(shared), 3, 3))], 1)
        ts = np.stack([np.zeros((len(shared), 3)),
                       np.broadcast_to(t_rel, (len(shared), 3))], 1)
        X_rel = np.asarray(
            triangulate_dlt(jnp.asarray(rays), jnp.asarray(Rs), jnp.asarray(ts),
                            jnp.ones((len(shared), 2), bool))
        )
        z_rel = X_rel[:, 2]
        good = (z_rel > 0.1) & (z_map > 0.1)
        if good.sum() < 5:
            return 1.0
        ratio = np.median(z_map[good] / z_rel[good])
        return float(np.clip(ratio, 0.1, 10.0))

    def _update_tracks(self, prev, kf, idx_prev, idx_cur):
        cam = self.camera
        state = self.state
        tracks_prev = self._kp_to_track[prev.idx]
        tracks_cur = self._kp_to_track[kf.idx]
        new_p0, new_p1, new_pairs = [], [], []
        for i, j in zip(idx_prev, idx_cur):
            if i in tracks_prev:
                tid = tracks_prev[i]
                if len(state.obs[tid]) < self.max_track_obs:
                    state.obs[tid][kf.idx] = kf.kpts[j]
                tracks_cur[j] = tid
            else:
                new_p0.append(prev.kpts[i])
                new_p1.append(kf.kpts[j])
                new_pairs.append((i, j))
        if new_p0:
            # triangulate new landmarks in world frame
            p0n = np.asarray(cam.normalize(jnp.asarray(np.asarray(new_p0)[None])))[0]
            p1n = np.asarray(cam.normalize(jnp.asarray(np.asarray(new_p1)[None])))[0]
            S = len(new_p0)
            rays = np.stack([p0n, p1n], 1)
            Rs = np.stack([np.broadcast_to(prev.R, (S, 3, 3)),
                           np.broadcast_to(kf.R, (S, 3, 3))], 1)
            ts = np.stack([np.broadcast_to(prev.t, (S, 3)),
                           np.broadcast_to(kf.t, (S, 3))], 1)
            Xw = np.asarray(
                triangulate_dlt(jnp.asarray(rays), jnp.asarray(Rs), jnp.asarray(ts),
                                jnp.ones((S, 2), bool))
            )
            z0 = (Xw @ prev.R.T + prev.t)[:, 2]
            z1 = (Xw @ kf.R.T + kf.t)[:, 2]
            for s, (i, j) in enumerate(new_pairs):
                if z0[s] < 0.2 or z1[s] < 0.2 or not np.isfinite(Xw[s]).all():
                    continue
                tid = len(state.X)
                state.X.append(Xw[s])
                state.obs.append({prev.idx: prev.kpts[i], kf.idx: kf.kpts[j]})
                tracks_prev[i] = tid
                tracks_cur[j] = tid

    def _run_ba(self):
        """Windowed BA over the last ba_window keyframes."""
        state = self.state
        kfs = state.keyframes[-self.ba_window :]
        kf_ids = {kf.idx: local for local, kf in enumerate(kfs)}
        K_obs = self.max_track_obs
        track_ids, cam_idx, uv, valid = [], [], [], []
        for tid, obs in enumerate(state.obs):
            in_window = {k: v for k, v in obs.items() if k in kf_ids}
            if len(in_window) < 2:
                continue
            track_ids.append(tid)
            ci = np.zeros(K_obs, np.int32)
            pix = np.zeros((K_obs, 2), np.float32)
            vm = np.zeros(K_obs, bool)
            for n, (k, p) in enumerate(list(in_window.items())[:K_obs]):
                ci[n] = kf_ids[k]
                pix[n] = p
                vm[n] = True
            cam_idx.append(ci)
            uv.append(pix)
            valid.append(vm)
        if len(track_ids) < 16:
            return
        # pad landmark count for compile reuse
        P = len(track_ids)
        P_pad = -(-P // 256) * 256
        pad = P_pad - P
        problem = BAProblem(
            jnp.asarray(np.stack([kf.R for kf in kfs]), jnp.float32),
            jnp.asarray(np.stack([kf.t for kf in kfs]), jnp.float32),
            jnp.asarray(
                np.pad(np.stack([state.X[t] for t in track_ids]), ((0, pad), (0, 0))),
                jnp.float32,
            ),
            jnp.asarray(np.pad(np.stack(cam_idx), ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(np.stack(uv), ((0, pad), (0, 0), (0, 0))), jnp.float32),
            jnp.asarray(np.pad(np.stack(valid), ((0, pad), (0, 0)))),
            jnp.asarray(np.asarray(self.camera.calibration_matrix()), jnp.float32),
        )
        refined, cost, _ = bundle_adjust(problem, iterations=6)
        R_new = np.asarray(refined.R)
        t_new = np.asarray(refined.t)
        X_new = np.asarray(refined.X)
        for local, kf in enumerate(kfs):
            kf.R = R_new[local]
            kf.t = t_new[local]
        for s, tid in enumerate(track_ids):
            state.X[tid] = X_new[s]

    # ------------------------------------------------------------------- eval
    def trajectory(self) -> np.ndarray:
        R = np.stack([kf.R for kf in self.state.keyframes])
        t = np.stack([kf.t for kf in self.state.keyframes])
        return camera_centers(R, t)

    def evaluate_ate(self, gt_positions: np.ndarray) -> dict:
        return absolute_trajectory_error(self.trajectory(), gt_positions)


__all__ = ["IncrementalSlam", "Keyframe", "SlamState"]
