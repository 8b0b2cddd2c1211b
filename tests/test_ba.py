"""Bundle adjustment: synthetic-GT convergence + restore-guard semantics.

Mirrors the reference's BA behavior (SBAdriver::perform_sba,
refineStereoBA/refineMultCamBA — SURVEY.md P10/P11): BA must pull a
perturbed pose+structure back to the ground truth, and the restore guards
must reject updates that move the pose too far.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_pose
from matchinglib_poselib_tpu.config import BAConfig
from matchinglib_poselib_tpu.ops import ba, geometry as geo


def make_two_view_scene(rng, n=200, noise_px=0.3, K_f=600.0):
    R, t = random_pose(rng, max_angle_deg=15.0)
    X = np.stack(
        [
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(4.0, 10.0, n),
        ],
        axis=1,
    )
    K = np.array([[K_f, 0, 320.0], [0, K_f, 240.0], [0, 0, 1.0]])

    def project(Xw, Rc, tc):
        Xc = Xw @ Rc.T + tc
        xn = Xc[:, :2] / Xc[:, 2:3]
        return xn @ K[:2, :2].T + K[:2, 2]

    x1 = project(X, np.eye(3), np.zeros(3))
    x2 = project(X, R, t)
    if noise_px > 0:
        x1 = x1 + rng.normal(scale=noise_px, size=x1.shape)
        x2 = x2 + rng.normal(scale=noise_px, size=x2.shape)
    return R, t, X, K, x1, x2


def perturb_rotation(R, deg, axis):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    a = np.deg2rad(deg)
    Kx = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    dR = np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * (Kx @ Kx)
    return R @ dR


class TestStereoBA:
    def test_recovers_perturbed_pose(self, rng):
        R, t, X, K, x1, x2 = make_two_view_scene(rng, n=250, noise_px=0.2)
        t_unit = t / np.linalg.norm(t)
        # perturb pose by ~0.8 deg and structure by noise (scaled to ||t||=1)
        R0 = perturb_rotation(R, 0.8, [0.3, 1.0, -0.2])
        X0 = (X + rng.normal(scale=0.02, size=X.shape)) / np.linalg.norm(t)

        cfg = BAConfig(iterations=25, angle_thresh_deg=5.0, t_norm_thresh=0.5)
        res = ba.refine_stereo_ba(
            jnp.asarray(R0, jnp.float32),
            jnp.asarray(t_unit, jnp.float32),
            jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32),
            jnp.asarray(X0, jnp.float32),
            jnp.ones(len(X), jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(K, jnp.float32),
            cfg,
        )
        assert not bool(res.restored)
        assert float(res.final_cost) < float(res.initial_cost)
        rdiff, tang, _ = geo.compare_poses(
            jnp.asarray(R, jnp.float32), jnp.asarray(t_unit, jnp.float32),
            res.R, res.t,
        )
        rdiff0, tang0, _ = geo.compare_poses(
            jnp.asarray(R, jnp.float32), jnp.asarray(t_unit, jnp.float32),
            jnp.asarray(R0, jnp.float32), jnp.asarray(t_unit, jnp.float32),
        )
        # BA must improve on the perturbed initialization
        assert float(rdiff) < float(rdiff0)
        assert float(rdiff) < 0.25  # degrees
        assert float(tang) < 1.0

    def test_restore_guard_rejects_large_motion(self, rng):
        """A tiny angle threshold forces the guard to restore the input
        (the reference restores if dR > angleThresh, pose_estim.h:239)."""
        R, t, X, K, x1, x2 = make_two_view_scene(rng, n=150, noise_px=0.2)
        t_unit = t / np.linalg.norm(t)
        R0 = perturb_rotation(R, 2.0, [1.0, 0.2, 0.1])
        X0 = X / np.linalg.norm(t)

        cfg = BAConfig(iterations=15, angle_thresh_deg=1e-4, t_norm_thresh=1e-6)
        res = ba.refine_stereo_ba(
            jnp.asarray(R0, jnp.float32),
            jnp.asarray(t_unit, jnp.float32),
            jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32),
            jnp.asarray(X0, jnp.float32),
            jnp.ones(len(X), jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(K, jnp.float32),
            cfg,
        )
        assert bool(res.restored)
        np.testing.assert_allclose(np.asarray(res.R), R0, atol=1e-6)

    def test_masked_points_ignored(self, rng):
        """Corrupted-but-masked observations must not affect the result."""
        R, t, X, K, x1, x2 = make_two_view_scene(rng, n=200, noise_px=0.1)
        t_unit = t / np.linalg.norm(t)
        R0 = perturb_rotation(R, 0.5, [0, 1, 0])
        Xs = X / np.linalg.norm(t)
        mask = np.ones(len(X), np.float32)
        mask[150:] = 0.0
        x2_bad = x2.copy()
        x2_bad[150:] += 300.0  # gross corruption in masked region

        cfg = BAConfig(iterations=20, angle_thresh_deg=5.0, t_norm_thresh=0.5)
        args = lambda x2v: (
            jnp.asarray(R0, jnp.float32), jnp.asarray(t_unit, jnp.float32),
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2v, jnp.float32),
            jnp.asarray(Xs, jnp.float32), jnp.asarray(mask),
            jnp.asarray(K, jnp.float32), jnp.asarray(K, jnp.float32), cfg,
        )
        res_bad = ba.refine_stereo_ba(*args(x2_bad))
        res_ref = ba.refine_stereo_ba(*args(x2))
        np.testing.assert_allclose(
            np.asarray(res_bad.R), np.asarray(res_ref.R), atol=1e-5
        )


class TestMultiCamBA:
    def test_three_camera_window(self, rng):
        """3-camera rig: cam0 fixed, perturbed cams 1-2 converge to GT."""
        n = 150
        X = np.stack(
            [
                rng.uniform(-2, 2, n),
                rng.uniform(-1.5, 1.5, n),
                rng.uniform(5, 12, n),
            ],
            axis=1,
        )
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        Rs, ts = [np.eye(3)], [np.zeros(3)]
        for i in range(2):
            Ri, ti = random_pose(rng, max_angle_deg=10.0)
            Rs.append(Ri)
            ts.append(ti * 0.5)
        Rs, ts = np.stack(Rs), np.stack(ts)

        obs = np.zeros((n, 3, 2))
        for c in range(3):
            Xc = X @ Rs[c].T + ts[c]
            xn = Xc[:, :2] / Xc[:, 2:3]
            obs[:, c] = xn @ K[:2, :2].T + K[:2, 2]
        obs += rng.normal(scale=0.2, size=obs.shape)

        R0 = Rs.copy()
        R0[1] = perturb_rotation(Rs[1], 0.6, [1, 0, 0])
        R0[2] = perturb_rotation(Rs[2], 0.6, [0, 0, 1])
        t0 = ts + rng.normal(scale=0.005, size=ts.shape)
        t0[0] = 0
        X0 = X + rng.normal(scale=0.01, size=X.shape)

        res, restored = ba.refine_multi_cam_ba(
            jnp.asarray(obs, jnp.float32),
            jnp.ones((n, 3), jnp.float32),
            jnp.asarray(R0, jnp.float32),
            jnp.asarray(t0, jnp.float32),
            jnp.asarray(np.stack([K] * 3), jnp.float32),
            jnp.asarray(X0, jnp.float32),
            iterations=25,
            angle_thresh_deg=5.0,
            t_norm_thresh=0.5,
        )
        assert float(res.final_cost) < float(res.initial_cost)
        for c in (1, 2):
            rdiff, _, _ = geo.compare_poses(
                jnp.asarray(Rs[c], jnp.float32),
                jnp.asarray(ts[c], jnp.float32),
                res.R[c], res.t[c],
            )
            rdiff0, _, _ = geo.compare_poses(
                jnp.asarray(Rs[c], jnp.float32),
                jnp.asarray(ts[c], jnp.float32),
                jnp.asarray(R0[c], jnp.float32),
                jnp.asarray(t0[c], jnp.float32),
            )
            assert float(rdiff) < float(rdiff0)
            assert float(rdiff) < 0.3

    def _rig_scene(self, rng, n=400, n_cams=4, dist_k1=-0.15, noise_px=0.1):
        """n_cams-camera rig observing a cloud through distorted lenses."""
        X = np.stack(
            [
                rng.uniform(-2, 2, n),
                rng.uniform(-1.5, 1.5, n),
                rng.uniform(5, 12, n),
            ],
            axis=1,
        )
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        dist_gt = np.zeros((n_cams, 5))
        dist_gt[:, 0] = dist_k1  # per-cam radial k1
        dist_gt[:, 1] = 0.03
        Rs, ts = [np.eye(3)], [np.zeros(3)]
        for i in range(n_cams - 1):
            Ri, ti = random_pose(rng, max_angle_deg=10.0)
            Rs.append(Ri)
            ts.append(ti * 0.5)
        Rs, ts = np.stack(Rs), np.stack(ts)

        obs = np.zeros((n, n_cams, 2))
        for c in range(n_cams):
            Xc = X @ Rs[c].T + ts[c]
            xn = Xc[:, :2] / Xc[:, 2:3]
            r2 = np.sum(xn * xn, axis=1, keepdims=True)
            k1, k2 = dist_gt[c, 0], dist_gt[c, 1]
            xd = xn * (1.0 + k1 * r2 + k2 * r2 * r2)
            obs[:, c] = xd @ K[:2, :2].T + K[:2, 2]
        obs += rng.normal(scale=noise_px, size=obs.shape)
        return X, K, dist_gt, Rs, ts, obs

    def test_distortion_refinement_four_cams(self, rng):
        """BART=2 semantics: nonzero distortion + intrinsics recovered.

        Reference: refineMultCamBA with dists (pose_estim.cpp:1605-1618,
        optimInternals=2) refines K and the 5 distortion params per camera.
        """
        n = 400
        X, K, dist_gt, Rs, ts, obs = self._rig_scene(rng, n=n)

        # start from zero distortion, perturbed focal + poses
        K0 = np.stack([K] * 4)
        K0[:, 0, 0] *= 1.04
        K0[:, 1, 1] *= 1.04
        R0 = Rs.copy()
        for c in range(1, 4):
            R0[c] = perturb_rotation(Rs[c], 0.4, [1, 0.3 * c, 0])
        X0 = X + rng.normal(scale=0.01, size=X.shape)

        res, restored = ba.refine_multi_cam_ba(
            jnp.asarray(obs, jnp.float32),
            jnp.ones((n, 4), jnp.float32),
            jnp.asarray(R0, jnp.float32),
            jnp.asarray(ts, jnp.float32),
            jnp.asarray(K0, jnp.float32),
            jnp.asarray(X0, jnp.float32),
            iterations=40,
            refine_intrinsics=True,
            dist=jnp.zeros((4, 5), jnp.float32),
            angle_thresh_deg=5.0,
            t_norm_thresh=0.5,
        )
        assert not bool(np.any(np.asarray(restored)))
        assert float(res.final_cost) < float(res.initial_cost)
        d = np.asarray(res.dist)
        # k1 recovered per camera within tolerance
        np.testing.assert_allclose(d[:, 0], dist_gt[:, 0], atol=0.03)
        # focal pulled back toward GT (started 4% high)
        f_err0 = abs(K0[1, 0, 0] / K[0, 0] - 1.0)
        f_err = np.abs(np.asarray(res.K)[:, 0, 0] / K[0, 0] - 1.0)
        assert np.all(f_err < f_err0)

    def test_restore_is_all_or_nothing(self, rng):
        """If ANY camera trips the guard every camera restores
        (pose_estim.cpp:1654-1716)."""
        n = 120
        X, K, dist_gt, Rs, ts, obs = self._rig_scene(
            rng, n=n, dist_k1=0.0, noise_px=0.0
        )
        # corrupt cam3's observations so BA drags it far from its init
        obs = obs.copy()
        obs[:, 3, :] += rng.normal(scale=80.0, size=(n, 2))
        res, restored = ba.refine_multi_cam_ba(
            jnp.asarray(obs, jnp.float32),
            jnp.ones((n, 4), jnp.float32),
            jnp.asarray(Rs, jnp.float32),
            jnp.asarray(ts, jnp.float32),
            jnp.asarray(np.stack([K] * 4), jnp.float32),
            jnp.asarray(X, jnp.float32),
            iterations=15,
            angle_thresh_deg=0.5,
            t_norm_thresh=0.01,
        )
        r = np.asarray(restored)
        assert not r[0]
        # cams 1..3 restore together or not at all
        assert r[1:].all() or not r[1:].any()
        if r[1:].all():
            np.testing.assert_allclose(
                np.asarray(res.R), Rs.astype(np.float32), atol=1e-6
            )

    def test_motion_only_keeps_structure(self, rng):
        """BA_MOT (optimMotionOnly): points must come back untouched."""
        n = 150
        X, K, dist_gt, Rs, ts, obs = self._rig_scene(
            rng, n=n, dist_k1=0.0, noise_px=0.1
        )
        X0 = X + rng.normal(scale=0.005, size=X.shape)
        res, restored = ba.refine_multi_cam_ba(
            jnp.asarray(obs, jnp.float32),
            jnp.ones((n, 4), jnp.float32),
            jnp.asarray(Rs, jnp.float32),
            jnp.asarray(ts, jnp.float32),
            jnp.asarray(np.stack([K] * 4), jnp.float32),
            jnp.asarray(X0, jnp.float32),
            iterations=10,
            motion_only=True,
            angle_thresh_deg=5.0,
            t_norm_thresh=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(res.points), X0.astype(np.float32), atol=1e-7
        )


class TestLowLevel:
    def test_exp_so3_roundtrip(self, rng):
        w = rng.normal(size=(16, 3)) * 0.5
        R = ba.exp_so3(jnp.asarray(w, jnp.float32))
        # orthonormal, det 1
        RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
        # angle == ||w||
        ang = np.asarray(geo.rotation_angle(R))
        np.testing.assert_allclose(ang, np.linalg.norm(w, axis=1), atol=1e-5)

    def test_exp_so3_small_angle(self):
        R = ba.exp_so3(jnp.asarray([1e-9, 0.0, 0.0], jnp.float32))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_ba_struct_only_mode(self, rng):
        """refine_motion=False leaves the cameras untouched (BA_STRUCT)."""
        R, t, X, K, x1, x2 = make_two_view_scene(rng, n=100, noise_px=0.1)
        t_unit = t / np.linalg.norm(t)
        Xs = (X + rng.normal(scale=0.05, size=X.shape)) / np.linalg.norm(t)
        obs = jnp.asarray(np.stack([x1, x2], axis=1), jnp.float32)
        vis = jnp.ones((len(X), 2), jnp.float32)
        Rs = jnp.asarray(np.stack([np.eye(3), R]), jnp.float32)
        ts = jnp.asarray(np.stack([np.zeros(3), t_unit]), jnp.float32)
        Ks = jnp.asarray(np.stack([K, K]), jnp.float32)
        dists = jnp.zeros((2, 5), jnp.float32)
        free = jnp.asarray([0.0, 1.0], jnp.float32)

        res = ba.bundle_adjust(
            obs, vis, Rs, ts, Ks, dists, jnp.asarray(Xs, jnp.float32), free,
            iterations=10, refine_motion=False,
        )
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(Rs), atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(ts), atol=1e-6)
        assert float(res.final_cost) < float(res.initial_cost)
