"""Continuous stereo pose refinement: the streaming framework.

TPU-native re-design of poselib::StereoRefine (SURVEY.md P14, §3.4;
reference: poselib/source/stereo_pose_refinement.cpp, header
stereo_pose_refinement.h:100-176 ConfigPoseEstimation):

- per-frame flow of addNewCorrespondences (:416-952): undistort -> inlier
  check vs pose history -> {robust re-estimation | pool refinement | skip |
  reinit} state machine
- correspondence pool with spatial dedup, weight eviction and outlier
  removal (ops/pool.py replaces the std::list + nanoflann KD-tree)
- pose history ring with most-likely-pose ranking (getNearToMeanPose :2817)
  and stability detection (checkPoseStability :3131-3299)
- skip-and-restore with maxSkipPairs escalation (updateMaxSkipPairs :3300)
- algorithmic failure recovery (SURVEY.md §5.3): restore-old-pose on bad
  pairs, full reinit after too many skips, pool-robust fallback, BA
  restore guards

Design split: the branchy per-frame decision logic runs on host over a
handful of scalars (one device->host sync per frame); every heavy
computation — Sampson scoring over the pool, robust hypothesis batches,
IRLS refinement, BA, dedup distance matrices, eviction sorts — is a jitted
fixed-shape device program compiled once and reused for every frame.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.config import StereoRefineConfig
from matchinglib_poselib_tpu.ops import ba, geometry as geo, pool as poolops
from matchinglib_poselib_tpu.ops import refine, robust


class FrameResult(NamedTuple):
    """Per-frame output (the reference returns these via getters)."""

    state: str  # init | refined | robust | reinit | skipped | rejected
    R: np.ndarray  # (3, 3) current pose estimate
    t: np.ndarray  # (3,) unit translation
    E: np.ndarray  # (3, 3)
    inlier_ratio: float  # inlier ratio of the new frame vs the pose
    pool_size: int
    pose_is_stable: bool
    most_likely_pose_stable: bool
    R_most_likely: np.ndarray
    t_most_likely: np.ndarray
    skip_count: int


# ---------------------------------------------------------------------------
# jitted device steps (compiled once per static shape/config)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def _robust_pose(x1, x2, mask, quality, th_sq, cfg, key):
    """Robust E + pose recovery on one (padded) correspondence set."""
    res, _ = robust.estimate_essential_robust(
        x1, x2, mask, quality, cfg.pose.robust, key, threshold_sq=th_sq
    )
    E = res.model
    inl = res.inlier_mask
    if cfg.pose.refine.enabled:
        rres = refine.refine_essential_linear(
            E, x1, x2, mask, res.threshold, cfg.pose.refine
        )
        keep = rres.n_inliers >= (res.n_inliers // 2)
        E = jnp.where(keep, rres.model, E)
        inl = jnp.where(keep, rres.inlier_mask, inl)
    R, t, X, ok3d, _ = geo.recover_pose(E, x1, x2, inl.astype(x1.dtype))
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    ratio = jnp.sum(inl).astype(x1.dtype) / n_valid
    return E, R, t, inl, ratio, X, ok3d


@functools.partial(jax.jit, static_argnames=("cfg",))
def _refine_pool_pose(E0, pool: poolops.Pool, th_sq, cfg):
    """IRLS linear refinement of the pose on ALL pool correspondences,
    optionally followed by BA on the pool inliers (refinePoseFromPool,
    stereo_pose_refinement.cpp:1767)."""
    maskf = pool.valid.astype(pool.x1.dtype)
    rres = refine.refine_essential_linear(
        E0, pool.x1, pool.x2, maskf, th_sq, cfg.pose.refine
    )
    E = rres.model
    inl = rres.inlier_mask
    R, t, X, ok3d, _ = geo.recover_pose(
        E, pool.x1, pool.x2, inl.astype(pool.x1.dtype)
    )
    if cfg.pose.ba.enabled:
        eyeK = jnp.eye(3, dtype=pool.x1.dtype)
        bres = ba.refine_stereo_ba(
            R, t, pool.x1, pool.x2, X,
            (inl & ok3d).astype(pool.x1.dtype), eyeK, eyeK, cfg.pose.ba,
            huber_delta=jnp.sqrt(th_sq),
        )
        R, t = bres.R, bres.t
        E = geo.essential_from_rt(R, t)
        inl = (geo.sampson_error(E, pool.x1, pool.x2) < th_sq) & pool.valid
    n_valid = jnp.maximum(jnp.sum(maskf), 1.0)
    ratio = jnp.sum(inl).astype(pool.x1.dtype) / n_valid
    return E, R, t, ratio


@jax.jit
def _frame_inlier_ratio(E, x1, x2, mask, th_sq):
    err = geo.sampson_error(E, x1, x2)
    inl = (err < th_sq) & mask.astype(bool)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(inl).astype(x1.dtype) / n, inl


@jax.jit
def _undistort(pts1, pts2, K1, K2, dist1, dist2):
    x1 = geo.undistort_oulu(geo.img_to_cam(pts1, K1), dist1)
    x2 = geo.undistort_oulu(geo.img_to_cam(pts2, K2), dist2)
    return x1, x2


# ---------------------------------------------------------------------------
# the framework
# ---------------------------------------------------------------------------


class StereoRefine:
    """Streaming stereo pose estimator over a fixed camera rig.

    Usage mirrors the reference (stereo_pose_refinement.h:185-334): create
    once with the calibration, then feed per-frame correspondences through
    `add_new_correspondences`. Poses are relative cam1 -> cam2 with unit
    translation.
    """

    def __init__(
        self,
        K1: np.ndarray,
        K2: np.ndarray,
        dist1: np.ndarray | None = None,
        dist2: np.ndarray | None = None,
        cfg: StereoRefineConfig = StereoRefineConfig(),
        seed: int = 0,
    ):
        self.cfg = cfg
        self.K1 = jnp.asarray(K1, jnp.float32)
        self.K2 = jnp.asarray(K2, jnp.float32)
        self.dist1 = jnp.asarray(
            dist1 if dist1 is not None else np.zeros(5), jnp.float32
        )
        self.dist2 = jnp.asarray(
            dist2 if dist2 is not None else np.zeros(5), jnp.float32
        )
        f_mean = float(K1[0][0] + K1[1][1] + K2[0][0] + K2[1][1]) / 4.0
        th = cfg.pose.robust.threshold_px / f_mean
        self.th_sq = jnp.asarray(th * th, jnp.float32)
        self._key = jax.random.PRNGKey(seed)
        self.reset()

    # -- state management ---------------------------------------------------

    def reset(self):
        """Full reinitialization (reinitializeSystem,
        stereo_pose_refinement.cpp:1025): pool + history + counters."""
        self.pool = poolops.empty_pool(self.cfg.max_pool_correspondences)
        self.R = np.eye(3)
        self.t = np.array([1.0, 0.0, 0.0])
        self.E = np.zeros((3, 3))
        self.nr_estimation = 0
        self.frame_idx = 0
        self.skip_count = 0
        self.max_skip_pairs_new = self.cfg.max_skip_pairs
        self.pose_history: list[tuple[np.ndarray, np.ndarray]] = []
        self.ratio_history: list[float] = []
        self.pose_is_stable = False
        self.most_likely_pose_stable = False
        self.R_most_likely = np.eye(3)
        self.t_most_likely = np.array([1.0, 0.0, 0.0])
        self._frames_since_pool_robust = 0
        self._pool_robust_interval = self.cfg.check_pool_pose_robust

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _hist_ratio(self) -> float:
        if not self.ratio_history:
            return 0.0
        return float(np.mean(self.ratio_history[-10:]))

    def _push_history(self, R, t, ratio: float):
        self.pose_history.append((np.asarray(R), np.asarray(t)))
        self.ratio_history.append(float(ratio))
        if len(self.pose_history) > 100:
            self.pose_history = self.pose_history[-100:]
            self.ratio_history = self.ratio_history[-100:]

    # -- sub-steps ----------------------------------------------------------

    def _seed_pool(self, pts1, pts2, x1, x2, inl, desc_dist, response):
        """Replace the pool contents with the inliers of a fresh pose."""
        self.pool = poolops.empty_pool(self.cfg.max_pool_correspondences)
        E = jnp.asarray(self.E, jnp.float32)
        err = geo.sampson_error(E, x1, x2)
        w = poolops.correspondence_weight(err, desc_dist, response, self.th_sq)
        self.pool = poolops.insert_and_evict(
            self.pool, pts1, pts2, x1, x2, desc_dist, response, err,
            jnp.where(inl, w, 0.0), inl,
            jnp.asarray(self.frame_idx, jnp.int32),
        )

    def _set_pose(self, E, R, t):
        self.E = np.asarray(E)
        self.R = np.asarray(R)
        self.t = np.asarray(t)

    def _check_pose_stability(self):
        """checkPoseStability (stereo_pose_refinement.cpp:3131-3299):
        the pose is stable when the last `min_cont_stable_poses` accepted
        poses agree pairwise within the absolute/relative thresholds."""
        w = self.cfg.min_cont_stable_poses
        if len(self.pose_history) < w:
            self.pose_is_stable = False
            return
        recent = self.pose_history[-w:]
        stable = True
        for i in range(w - 1):
            R1, t1 = recent[i]
            R2, t2 = recent[i + 1]
            dR = R1.T @ R2
            ang = np.degrees(
                np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
            )
            dt = np.linalg.norm(t1 - t2)
            if ang > self.cfg.abs_thresh_diff or dt > self.cfg.max_rat_frame_to_frame:
                stable = False
                break
        self.pose_is_stable = stable

    def _get_near_to_mean_pose(self):
        """getNearToMeanPose (stereo_pose_refinement.cpp:2817): rank the
        pose history by distance to its center of gravity; the nearest
        becomes the most-likely pose."""
        if len(self.pose_history) < 2:
            self.R_most_likely = self.R.copy()
            self.t_most_likely = self.t.copy()
            self.most_likely_pose_stable = False
            return
        hist = self.pose_history[-20:]
        quats = []
        for R, _ in hist:
            q = np.asarray(geo.quat_from_rot(jnp.asarray(R, jnp.float32)))
            quats.append(q)
        quats = np.stack(quats)
        ts = np.stack([t for _, t in hist])
        q_mean = quats.mean(axis=0)
        q_mean /= max(np.linalg.norm(q_mean), 1e-12)
        t_mean = ts.mean(axis=0)
        t_mean /= max(np.linalg.norm(t_mean), 1e-12)
        # distance = rotation angle to mean + translation chord to mean
        dq = 2.0 * np.arccos(np.clip(np.abs(quats @ q_mean), -1.0, 1.0))
        dt = np.linalg.norm(ts - t_mean, axis=1)
        rank = dq + dt
        best = int(np.argmin(rank))
        self.R_most_likely = hist[best][0]
        self.t_most_likely = hist[best][1]
        # stable if the winner sits close to the center of gravity
        self.most_likely_pose_stable = bool(
            dq[best] < np.radians(self.cfg.abs_thresh_diff)
            and dt[best] < self.cfg.max_rat_frame_to_frame
        )

    def _update_max_skip_pairs(self):
        """updateMaxSkipPairs (stereo_pose_refinement.cpp:3300): with a
        stable pose, more consecutive bad pairs may be skipped before a
        full reinit; an unstable pose reverts to the configured base."""
        if self.pose_is_stable:
            self.max_skip_pairs_new = self.cfg.max_skip_pairs * 2
        else:
            self.max_skip_pairs_new = self.cfg.max_skip_pairs

    # -- main entry ---------------------------------------------------------

    def add_new_correspondences(
        self,
        pts1: np.ndarray,  # (K, 2) pixel coords, left
        pts2: np.ndarray,  # (K, 2) pixel coords, right
        mask: np.ndarray | None = None,  # (K,) validity
        quality: np.ndarray | None = None,  # (K,) PROSAC quality
        desc_dist: np.ndarray | None = None,
        response: np.ndarray | None = None,
    ) -> FrameResult:
        """Process one frame (addNewCorrespondences,
        stereo_pose_refinement.cpp:416-952)."""
        cfg = self.cfg
        K = pts1.shape[0]
        pts1 = jnp.asarray(pts1, jnp.float32)
        pts2 = jnp.asarray(pts2, jnp.float32)
        mask = (
            jnp.ones((K,), jnp.float32) if mask is None
            else jnp.asarray(mask, jnp.float32)
        )
        quality = (
            jnp.ones((K,), jnp.float32) if quality is None
            else jnp.asarray(quality, jnp.float32)
        )
        desc_dist = (
            jnp.zeros((K,), jnp.float32) if desc_dist is None
            else jnp.asarray(desc_dist, jnp.float32)
        )
        response = (
            jnp.zeros((K,), jnp.float32) if response is None
            else jnp.asarray(response, jnp.float32)
        )
        x1, x2 = _undistort(
            pts1, pts2, self.K1, self.K2, self.dist1, self.dist2
        )
        self.frame_idx += 1

        if self.nr_estimation == 0:
            result = self._robust_initialization(
                pts1, pts2, x1, x2, mask, quality, desc_dist, response
            )
        else:
            result = self._continuous_step(
                pts1, pts2, x1, x2, mask, quality, desc_dist, response
            )

        if self.skip_count > self.max_skip_pairs_new:
            # too many consecutive bad pairs -> full reinit (:943-948)
            self.reset()
            result = result._replace(state="reinit")
        return result

    # -- state-machine branches ----------------------------------------------

    def _result(self, state: str, ratio: float) -> FrameResult:
        return FrameResult(
            state=state,
            R=self.R.copy(), t=self.t.copy(), E=self.E.copy(),
            inlier_ratio=float(ratio),
            pool_size=int(self.pool.n_valid),
            pose_is_stable=self.pose_is_stable,
            most_likely_pose_stable=self.most_likely_pose_stable,
            R_most_likely=self.R_most_likely.copy(),
            t_most_likely=self.t_most_likely.copy(),
            skip_count=self.skip_count,
        )

    def _robust_initialization(
        self, pts1, pts2, x1, x2, mask, quality, desc_dist, response
    ) -> FrameResult:
        """robustInitialization (stereo_pose_refinement.cpp:968)."""
        E, R, t, inl, ratio, X, ok3d = _robust_pose(
            x1, x2, mask, quality, self.th_sq, self.cfg, self._next_key()
        )
        ratio_f = float(ratio)
        if ratio_f < self.cfg.min_start_agg_inl_rat:
            # not reliable enough to start aggregating (:1295 reject path)
            return self._result("rejected", ratio_f)
        self._set_pose(E, R, t)
        self._seed_pool(pts1, pts2, x1, x2, inl, desc_dist, response)
        self.nr_estimation = 1
        self.skip_count = 0
        self._push_history(self.R, self.t, ratio_f)
        self._check_pose_stability()
        self._get_near_to_mean_pose()
        return self._result("init", ratio_f)

    def _continuous_step(
        self, pts1, pts2, x1, x2, mask, quality, desc_dist, response
    ) -> FrameResult:
        cfg = self.cfg
        E_cur = jnp.asarray(self.E, jnp.float32)
        ratio_new, inl_new = _frame_inlier_ratio(
            E_cur, x1, x2, mask, self.th_sq
        )
        ratio_new = float(ratio_new)
        hist = self._hist_ratio()

        rel_drop = (hist - ratio_new) / max(hist, 1e-9)
        if rel_drop > cfg.rel_inl_rat_th_last:
            # significant drop -> robust re-estimation on the new frame (:492)
            E, R, t, inl, ratio_rob, X, ok3d = _robust_pose(
                x1, x2, mask, quality, self.th_sq, self.cfg, self._next_key()
            )
            ratio_rob_f = float(ratio_rob)
            rdiff, tang, _ = geo.compare_poses(
                jnp.asarray(self.R, jnp.float32),
                jnp.asarray(self.t, jnp.float32), R, t,
            )
            pose_changed = (
                float(rdiff) > cfg.abs_thresh_diff
                or float(tang) > np.degrees(cfg.max_rat_frame_to_frame)
            )
            if pose_changed and ratio_rob_f >= cfg.min_inlier_ratio_reinit:
                # the rig moved: reinitialize on the new pose (:1025)
                self.reset()
                self.frame_idx += 1
                self._set_pose(E, R, t)
                self._seed_pool(pts1, pts2, x1, x2, inl, desc_dist, response)
                self.nr_estimation = 1
                self._push_history(self.R, self.t, ratio_rob_f)
                return self._result("reinit", ratio_rob_f)
            if (
                ratio_rob_f < cfg.min_inlier_rat_skip
                and ratio_rob_f < cfg.rel_min_inlier_rat_skip * max(hist, 1e-9)
            ):
                # bad pair: restore the old pose and skip (:511-521)
                self.skip_count += 1
                return self._result("skipped", ratio_new)
            # unsure: robust estimation on the pool, keep history (:524-558)
            E_p, R_p, t_p, ratio_p = self._robust_on_pool()
            self._set_pose(E_p, R_p, t_p)
            self._push_history(self.R, self.t, float(ratio_p))
            self.skip_count = 0
            self._after_accept()
            return self._result("robust", float(ratio_p))

        # normal path: add to pool + refine (:594)
        self.skip_count = 0
        err_new = geo.sampson_error(E_cur, x1, x2)
        w_new = poolops.correspondence_weight(
            err_new, desc_dist, response, self.th_sq
        )
        keep_new = inl_new  # only pose-consistent correspondences enter
        new_valid, pool_valid = poolops.filter_new_vs_pool(
            self.pool, pts1, w_new, keep_new, cfg.min_pts_distance
        )
        self.pool = self.pool._replace(valid=pool_valid)
        self.pool = poolops.insert_and_evict(
            self.pool, pts1, pts2, x1, x2, desc_dist, response, err_new,
            jnp.where(new_valid, w_new, 0.0), new_valid,
            jnp.asarray(self.frame_idx, jnp.int32),
        )

        self._frames_since_pool_robust += 1
        if self._frames_since_pool_robust >= self._pool_robust_interval:
            # periodic robust estimation on the pool with exponential
            # backoff (:680-716, :703-713)
            E_p, R_p, t_p, ratio_p = self._robust_on_pool()
            self._frames_since_pool_robust = 0
            self._pool_robust_interval = min(
                self._pool_robust_interval * 2, 64
            )
            state = "robust"
        else:
            E_p, R_p, t_p, ratio_p = _refine_pool_pose(
                E_cur, self.pool, self.th_sq, self.cfg
            )
            state = "refined"
        ratio_p_f = float(ratio_p)

        # guard (:821-830): fewer than 75% of the pool support the refined
        # pose -> the aggregated state is inconsistent, reinitialize
        if ratio_p_f < 0.75:
            self.reset()
            return self._result("reinit", ratio_p_f)
        self._set_pose(E_p, R_p, t_p)
        self.nr_estimation += 1
        self._push_history(self.R, self.t, max(ratio_new, ratio_p_f))
        self._after_accept()
        return self._result(state, ratio_p_f)

    def _robust_on_pool(self):
        """robustEstimationOnPool (stereo_pose_refinement.cpp:1075)."""
        maskf = self.pool.valid.astype(jnp.float32)
        E, R, t, inl, ratio, X, ok3d = _robust_pose(
            self.pool.x1, self.pool.x2, maskf, self.pool.weight,
            self.th_sq, self.cfg, self._next_key(),
        )
        return E, R, t, ratio

    def _after_accept(self):
        """Post-acceptance housekeeping: pool error/weight update, outlier
        eviction, stability + most-likely pose (:861-940)."""
        E = jnp.asarray(self.E, jnp.float32)
        self.pool = poolops.update_pool_errors(self.pool, E, self.th_sq)
        self.pool = poolops.evict_outliers(self.pool, E, 4.0 * self.th_sq)
        self._check_pose_stability()
        self._get_near_to_mean_pose()
        self._update_max_skip_pairs()
