"""StereoRefine streaming framework: state machine + accuracy over a stream.

Synthetic rig: fixed stereo pose, per-frame correspondences with noise and
outliers. Checks the reference's behavioral contract (SURVEY.md §3.4):
init -> aggregate -> refine improves accuracy over single frames; bad
frames are skipped with the old pose restored; a persistent pose change
triggers reinitialization; pose stability is detected.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_pose
from matchinglib_poselib_tpu.config import (
    PoseConfig, RobustConfig, StereoRefineConfig,
)
from matchinglib_poselib_tpu.models.stereo_refine import StereoRefine
from matchinglib_poselib_tpu.ops import geometry as geo, pool as poolops


K_CAM = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])


def make_cfg(pool_cap=1024):
    return StereoRefineConfig(
        max_pool_correspondences=pool_cap,
        pose=PoseConfig(
            robust=RobustConfig(
                batch_hypotheses=128, max_batches=3, check_degeneracy=False
            )
        ),
    )


def gen_frame(rng, R, t, n=256, noise_px=0.4, outlier_frac=0.15):
    """One frame of pixel correspondences for the rig pose (R, t)."""
    X = np.stack(
        [
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(4.0, 12.0, n),
        ],
        axis=1,
    )
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    p1 = x1 @ K_CAM[:2, :2].T + K_CAM[:2, 2]
    p2 = x2 @ K_CAM[:2, :2].T + K_CAM[:2, 2]
    p1 += rng.normal(scale=noise_px, size=p1.shape)
    p2 += rng.normal(scale=noise_px, size=p2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        p2[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return p1.astype(np.float32), p2.astype(np.float32)


def pose_err(sr, R, t):
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t / np.linalg.norm(t), jnp.float32),
        jnp.asarray(sr.R, jnp.float32), jnp.asarray(sr.t, jnp.float32),
    )
    return float(rdiff), float(tang)


class TestStreaming:
    def test_init_then_refine_improves(self, rng):
        R, t = random_pose(rng, max_angle_deg=10.0)
        sr = StereoRefine(K_CAM, K_CAM, cfg=make_cfg())

        res = sr.add_new_correspondences(*gen_frame(rng, R, t))
        assert res.state == "init"
        r0, t0 = pose_err(sr, R, t)

        errs = []
        for _ in range(8):
            res = sr.add_new_correspondences(*gen_frame(rng, R, t))
            assert res.state in ("refined", "robust")
            errs.append(pose_err(sr, R, t))
        r_end, t_end = errs[-1]
        # aggregated pose must be accurate and at least as good as frame 1
        assert r_end < max(r0, 0.2)
        assert t_end < max(t0, 1.0)
        assert r_end < 0.2, f"rot err {r_end}"
        assert t_end < 1.0, f"t ang err {t_end}"
        assert res.pool_size > 400

    def test_bad_frames_are_skipped(self, rng):
        R, t = random_pose(rng, max_angle_deg=10.0)
        sr = StereoRefine(K_CAM, K_CAM, cfg=make_cfg())
        sr.add_new_correspondences(*gen_frame(rng, R, t))
        for _ in range(3):
            sr.add_new_correspondences(*gen_frame(rng, R, t))
        R_before = sr.R.copy()
        t_before = sr.t.copy()

        # pure-garbage frame: random correspondences
        p1 = rng.uniform([0, 0], [640, 480], size=(256, 2)).astype(np.float32)
        p2 = rng.uniform([0, 0], [640, 480], size=(256, 2)).astype(np.float32)
        res = sr.add_new_correspondences(p1, p2)
        assert res.state == "skipped"
        assert res.skip_count == 1
        np.testing.assert_allclose(sr.R, R_before)
        np.testing.assert_allclose(sr.t, t_before)

        # good frame afterwards resets the skip counter
        res = sr.add_new_correspondences(*gen_frame(rng, R, t))
        assert res.state in ("refined", "robust")
        assert res.skip_count == 0

    def test_too_many_skips_reinitializes(self, rng):
        R, t = random_pose(rng, max_angle_deg=10.0)
        cfg = StereoRefineConfig(
            max_pool_correspondences=1024,
            max_skip_pairs=2,
            pose=PoseConfig(
                robust=RobustConfig(
                    batch_hypotheses=128, max_batches=3,
                    check_degeneracy=False,
                )
            ),
        )
        sr = StereoRefine(K_CAM, K_CAM, cfg=cfg)
        sr.add_new_correspondences(*gen_frame(rng, R, t))
        sr.max_skip_pairs_new = 2  # no stability escalation yet

        last = None
        for _ in range(6):
            p1 = rng.uniform([0, 0], [640, 480], size=(256, 2)).astype(
                np.float32
            )
            p2 = rng.uniform([0, 0], [640, 480], size=(256, 2)).astype(
                np.float32
            )
            last = sr.add_new_correspondences(p1, p2)
            if last.state == "reinit":
                break
        assert last.state == "reinit"
        assert sr.nr_estimation == 0  # back to uninitialized

    def test_pose_change_triggers_reinit(self, rng):
        R, t = random_pose(rng, max_angle_deg=8.0)
        sr = StereoRefine(K_CAM, K_CAM, cfg=make_cfg())
        sr.add_new_correspondences(*gen_frame(rng, R, t))
        for _ in range(3):
            sr.add_new_correspondences(*gen_frame(rng, R, t))

        # the rig physically moves: clearly different pose, good frames
        R2, t2 = random_pose(rng, max_angle_deg=25.0)
        while np.degrees(
            np.arccos(np.clip((np.trace(R.T @ R2) - 1) / 2, -1, 1))
        ) < 10.0:
            R2, t2 = random_pose(rng, max_angle_deg=25.0)

        states = []
        for _ in range(3):
            res = sr.add_new_correspondences(
                *gen_frame(rng, R2, t2, noise_px=0.2, outlier_frac=0.05)
            )
            states.append(res.state)
            if res.state == "reinit":
                break
        assert "reinit" in states, f"states: {states}"
        r_err, t_err = pose_err(sr, R2, t2)
        assert r_err < 0.5
        assert t_err < 2.0

    def test_stability_detection(self, rng):
        R, t = random_pose(rng, max_angle_deg=10.0)
        sr = StereoRefine(K_CAM, K_CAM, cfg=make_cfg())
        sr.add_new_correspondences(*gen_frame(rng, R, t, noise_px=0.2))
        res = None
        for _ in range(6):
            res = sr.add_new_correspondences(
                *gen_frame(rng, R, t, noise_px=0.2)
            )
        assert res.pose_is_stable
        assert res.most_likely_pose_stable
        rdiff, _, _ = geo.compare_poses(
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t / np.linalg.norm(t), jnp.float32),
            jnp.asarray(res.R_most_likely, jnp.float32),
            jnp.asarray(res.t_most_likely, jnp.float32),
        )
        assert float(rdiff) < 0.3

    def test_rejects_garbage_initialization(self, rng):
        sr = StereoRefine(K_CAM, K_CAM, cfg=make_cfg())
        p1 = rng.uniform([0, 0], [640, 480], size=(256, 2)).astype(np.float32)
        p2 = rng.uniform([0, 0], [640, 480], size=(256, 2)).astype(np.float32)
        res = sr.add_new_correspondences(p1, p2)
        assert res.state == "rejected"
        assert sr.nr_estimation == 0


class TestPoolOps:
    def test_insert_and_evict_keeps_best(self, rng):
        pool = poolops.empty_pool(8)
        pts = rng.uniform(0, 100, size=(12, 2)).astype(np.float32)
        w = np.linspace(0.1, 1.2, 12).astype(np.float32)
        pool = poolops.insert_and_evict(
            pool,
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(pts) / 100,
            jnp.asarray(pts) / 100,
            jnp.zeros(12), jnp.zeros(12), jnp.zeros(12),
            jnp.asarray(w), jnp.ones(12, bool), jnp.asarray(0, jnp.int32),
        )
        assert int(pool.n_valid) == 8
        # the 8 highest weights survive
        kept = np.sort(np.asarray(pool.weight)[np.asarray(pool.valid)])
        np.testing.assert_allclose(kept, np.sort(w)[-8:], rtol=1e-6)

    def test_filter_dedup_keeps_better(self, rng):
        pool = poolops.empty_pool(8)
        base = np.array([[10.0, 10.0], [50.0, 50.0]], np.float32)
        pool = poolops.insert_and_evict(
            pool,
            jnp.asarray(base), jnp.asarray(base), jnp.asarray(base) / 100,
            jnp.asarray(base) / 100,
            jnp.zeros(2), jnp.zeros(2), jnp.zeros(2),
            jnp.asarray([0.5, 0.9], jnp.float32), jnp.ones(2, bool),
            jnp.asarray(0, jnp.int32),
        )
        # new points: one better than slot0 (nearby), one worse than slot1
        new_pts = np.array([[10.5, 10.2], [50.2, 49.9]], np.float32)
        new_w = jnp.asarray([0.8, 0.3], jnp.float32)
        new_valid, pool_valid = poolops.filter_new_vs_pool(
            pool, jnp.asarray(new_pts), new_w, jnp.ones(2, bool), 3.0
        )
        nv = np.asarray(new_valid)
        assert nv[0] and not nv[1]  # better new kept, worse new dropped
        # the displaced old entry was invalidated
        assert int(jnp.sum(pool_valid)) == int(pool.n_valid) - 1

    def test_evict_outliers(self):
        pool = poolops.empty_pool(4)
        x1 = np.array([[0.1, 0.1], [0.2, -0.1], [0.0, 0.3], [0.5, 0.5]],
                      np.float32)
        R = np.eye(3)
        t = np.array([1.0, 0, 0])
        E = np.asarray(geo.essential_from_rt(
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))
        # consistent x2 (pure horizontal shift) except the last (vertical)
        x2 = x1 + np.array([[0.05, 0]] * 3 + [[0.0, 0.2]], np.float32)
        pool = pool._replace(
            x1=jnp.asarray(x1), x2=jnp.asarray(x2),
            valid=jnp.ones(4, bool),
        )
        out = poolops.evict_outliers(pool, jnp.asarray(E), jnp.asarray(1e-6))
        v = np.asarray(out.valid)
        assert v[:3].all() and not v[3]
