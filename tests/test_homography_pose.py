"""Halign: homography decomposition and multi-plane pose.

Synthetic scenes with known (R, t) and one or more planes; the
decomposition must contain the true pose among its 4 candidates, and the
full Halign pipeline must recover it (reference behavior:
estimatePoseHomographies, pose_homography.cpp:127)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import random_pose
from matchinglib_poselib_tpu.config import HalignConfig, RobustConfig, PoseEstimator, MinimalSolver
from matchinglib_poselib_tpu.ops import geometry as geo, homography_pose as hp


def plane_scene(rng, R, t, n, d, n_pts):
    """Points on the plane n^T X = d (camera-1 frame), projected into both."""
    # sample points on the plane: pick two tangents
    n = n / np.linalg.norm(n)
    a = np.cross(n, [1.0, 0.0, 0.0])
    if np.linalg.norm(a) < 1e-3:
        a = np.cross(n, [0.0, 1.0, 0.0])
    a /= np.linalg.norm(a)
    b = np.cross(n, a)
    center = n * d
    uv = rng.uniform(-1.5, 1.5, (n_pts, 2))
    X = center + uv[:, :1] * a + uv[:, 1:] * b
    X = X[X[:, 2] > 0.3]
    X2 = X @ R.T + t
    keep = X2[:, 2] > 0.3
    X, X2 = X[keep], X2[keep]
    return X[:, :2] / X[:, 2:], X2[:, :2] / X2[:, 2:], X


def homography_of(R, t, n, d):
    return R + np.outer(t, n / d)


def test_decompose_recovers_pose(rng):
    R, _ = random_pose(rng, max_angle_deg=15.0)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t) * 4  # |t| = 0.25
    n = np.array([0.1, -0.2, 1.0])
    n /= np.linalg.norm(n)
    d = 5.0
    H = homography_of(R, t, n, d)
    dec = hp.decompose_homography(jnp.asarray(H, jnp.float32))
    rds, tds = [], []
    for i in range(4):
        rd, td, _ = geo.compare_poses(
            jnp.asarray(R, jnp.float32), jnp.asarray(t / np.linalg.norm(t), jnp.float32),
            dec.R[i], dec.t[i],
        )
        rds.append(float(rd))
        tds.append(float(td))
    best = int(np.argmin(np.asarray(rds) + np.asarray(tds)))
    assert rds[best] < 0.1, f"rotation candidates {rds}"
    assert tds[best] < 0.5, f"translation candidates {tds}"


def test_decompose_pure_rotation(rng):
    R, _ = random_pose(rng, max_angle_deg=10.0)
    dec = hp.decompose_homography(jnp.asarray(R, jnp.float32))
    # all candidates collapse to the rotation with zero translation
    rd = geo.rotation_angle(
        jnp.swapaxes(dec.R[0], -1, -2) @ jnp.asarray(R, jnp.float32)
    )
    assert float(rd) < 1e-2
    assert float(jnp.linalg.norm(dec.t[0])) < 1e-6


def _pad(x, n):
    out = np.zeros((n, 2), np.float32)
    out[: len(x)] = x
    return out


def test_halign_single_plane(rng):
    R, _ = random_pose(rng, max_angle_deg=8.0)
    t = np.array([0.3, -0.05, 0.02])
    x1, x2, _ = plane_scene(rng, R, t, np.array([0.05, 0.1, 1.0]), 6.0, 400)
    N = 512
    n_real = len(x1)
    mask = np.zeros(N, bool)
    mask[:n_real] = True
    x1p, x2p = _pad(x1, N), _pad(x2, N)
    x1p[n_real:] = rng.uniform(-1, 1, (N - n_real, 2))
    x2p[n_real:] = rng.uniform(-1, 1, (N - n_real, 2))

    res = hp.estimate_pose_halign(
        jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(mask),
        jnp.ones(N, jnp.float32),
        HalignConfig(max_planes=2),
        RobustConfig(
            estimator=PoseEstimator.RANSAC, solver=MinimalSolver.HOMOGRAPHY,
            batch_hypotheses=128, max_batches=4, check_degeneracy=False,
        ),
        jax.random.PRNGKey(0),
        threshold_sq=1e-5,
    )
    assert int(res.n_planes) >= 1
    rd, td, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t / np.linalg.norm(t), jnp.float32),
        res.R, res.t,
    )
    assert float(rd) < 0.5, f"rotation error {float(rd)}"
    assert float(td) < 2.0, f"translation error {float(td)}"
    assert int(res.n_inliers) > 0.8 * n_real


def test_halign_two_planes(rng):
    """Two-plane scene: both planes extracted, pose from joint scoring."""
    R, _ = random_pose(rng, max_angle_deg=6.0)
    t = np.array([0.25, 0.03, -0.01])
    x1a, x2a, _ = plane_scene(rng, R, t, np.array([0.0, 0.0, 1.0]), 5.0, 300)
    x1b, x2b, _ = plane_scene(rng, R, t, np.array([0.6, 0.0, 0.8]), 8.0, 300)
    x1 = np.concatenate([x1a, x1b])
    x2 = np.concatenate([x2a, x2b])
    N = 1024
    n_real = len(x1)
    mask = np.zeros(N, bool)
    mask[:n_real] = True
    res = hp.estimate_pose_halign(
        jnp.asarray(_pad(x1, N)), jnp.asarray(_pad(x2, N)),
        jnp.asarray(mask), jnp.ones(N, jnp.float32),
        HalignConfig(max_planes=3),
        RobustConfig(
            estimator=PoseEstimator.RANSAC, solver=MinimalSolver.HOMOGRAPHY,
            batch_hypotheses=128, max_batches=4, check_degeneracy=False,
        ),
        jax.random.PRNGKey(1),
        threshold_sq=1e-5,
    )
    assert int(res.n_planes) >= 2
    rd, td, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t / np.linalg.norm(t), jnp.float32),
        res.R, res.t,
    )
    assert float(rd) < 0.5
    assert float(td) < 2.0


def test_halign_error_code_no_planes(rng):
    """Pure-noise correspondences: no plane reaches min_plane_inliers ->
    error -1 (estimatePoseHomographies, pose_homography.cpp:200)."""
    N = 512
    x1 = rng.uniform(-1, 1, (N, 2)).astype(np.float32)
    x2 = rng.uniform(-1, 1, (N, 2)).astype(np.float32)
    res = hp.estimate_pose_halign(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(N, bool),
        jnp.ones(N, jnp.float32),
        HalignConfig(max_planes=2),
        RobustConfig(
            estimator=PoseEstimator.RANSAC, solver=MinimalSolver.HOMOGRAPHY,
            batch_hypotheses=128, max_batches=2, check_degeneracy=False,
        ),
        jax.random.PRNGKey(3),
        threshold_sq=1e-7,
    )
    assert int(res.error_code) == -1


def test_halign_error_code_ok_on_plane(rng):
    """The planar regime keeps error 0 and reports plane strengths."""
    R, _ = random_pose(rng, max_angle_deg=8.0)
    t = np.array([0.3, -0.05, 0.02])
    x1, x2, _ = plane_scene(rng, R, t, np.array([0.05, 0.1, 1.0]), 6.0, 400)
    N = 512
    n_real = len(x1)
    mask = np.zeros(N, bool)
    mask[:n_real] = True
    res = hp.estimate_pose_halign(
        jnp.asarray(_pad(x1, N)), jnp.asarray(_pad(x2, N)),
        jnp.asarray(mask), jnp.ones(N, jnp.float32),
        HalignConfig(max_planes=2),
        RobustConfig(
            estimator=PoseEstimator.RANSAC, solver=MinimalSolver.HOMOGRAPHY,
            batch_hypotheses=128, max_batches=4, check_degeneracy=False,
        ),
        jax.random.PRNGKey(4),
        threshold_sq=1e-5,
    )
    assert int(res.error_code) == 0
    assert float(jnp.sum(res.plane_strengths)) > 0.5


def test_estimate_pose_halign_fallback_nonplanar(rng):
    """estimate_pose with use_halign on a NON-planar scene must not
    silently return a plane-biased pose: Halign reports failure (-1/-2)
    and the robust-E fallback recovers the true pose (the reference's
    caller behavior on error codes, pose_homography.cpp:200-266)."""
    from matchinglib_poselib_tpu.config import PoseConfig
    from matchinglib_poselib_tpu.models import pipeline

    R, _ = random_pose(rng, max_angle_deg=6.0)
    t = np.array([0.8, -0.1, 0.15])
    t /= np.linalg.norm(t)
    n_pts = 400
    X = np.stack([
        rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts),
        rng.uniform(3, 20, n_pts),
    ], axis=1)
    X2 = X @ R.T + t
    keep = (X[:, 2] > 0.3) & (X2[:, 2] > 0.3)
    X, X2 = X[keep], X2[keep]
    K = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]],
                 dtype=np.float32)
    p1 = (X / X[:, 2:]) @ K.T
    p2 = (X2 / X2[:, 2:]) @ K.T
    N = 512
    n_real = len(p1)
    mask = np.zeros(N, bool)
    mask[:n_real] = True
    cfg = PoseConfig(use_halign=True)
    res = pipeline.estimate_pose(
        jnp.asarray(_pad(p1[:, :2], N)), jnp.asarray(_pad(p2[:, :2], N)),
        jnp.asarray(mask), jnp.ones(N, jnp.float32),
        jnp.asarray(K), jnp.asarray(K),
        jnp.zeros(5, jnp.float32), jnp.zeros(5, jnp.float32),
        cfg, jax.random.PRNGKey(5),
    )
    rd, td, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        res.R, res.t,
    )
    assert float(rd) < 0.5, f"rotation error {float(rd)} deg"
    assert float(td) < 2.0, f"translation error {float(td)} deg"


def test_halign_rotation_only_flag(rng):
    """No-parallax scene: rotation-only flag raised, R still recovered."""
    R, _ = random_pose(rng, max_angle_deg=5.0)
    Xd = np.stack(
        [rng.uniform(-2, 2, 300), rng.uniform(-2, 2, 300),
         rng.uniform(4, 12, 300)], axis=1,
    )
    x1 = Xd[:, :2] / Xd[:, 2:]
    X2 = Xd @ R.T  # t = 0
    x2 = X2[:, :2] / X2[:, 2:]
    N = 512
    mask = np.zeros(N, bool)
    mask[:300] = True
    res = hp.estimate_pose_halign(
        jnp.asarray(_pad(x1, N)), jnp.asarray(_pad(x2, N)),
        jnp.asarray(mask), jnp.ones(N, jnp.float32),
        HalignConfig(max_planes=1),
        RobustConfig(
            estimator=PoseEstimator.RANSAC, solver=MinimalSolver.HOMOGRAPHY,
            batch_hypotheses=128, max_batches=4, check_degeneracy=False,
        ),
        jax.random.PRNGKey(2),
        threshold_sq=1e-5,
    )
    assert bool(res.is_rotation_only)
    rd = geo.rotation_angle(
        jnp.swapaxes(res.R, -1, -2) @ jnp.asarray(R, jnp.float32)
    ) * 180.0 / np.pi
    assert float(rd) < 0.5
