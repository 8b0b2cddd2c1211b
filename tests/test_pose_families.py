"""Tests for fundamental 7pt, rotation-only family, QDEGSAC, and the Kneip
eigensolver equivalent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.config import PoseEstimator, RobustConfig
from matchinglib_poselib_tpu.ops import eigensolver, geometry as geo, robust, solvers
from tests.conftest import random_pose, synthetic_correspondences


def _pad(x, n):
    out = np.zeros((n, x.shape[1]), np.float32)
    out[: x.shape[0]] = x
    return jnp.asarray(out)


def test_solve_7pt_recovers_f(rng):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(rng, R, t, 7)
    E_true = geo.essential_from_rt(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    F, valid = solvers.solve_7pt(
        jnp.asarray(x1[None], jnp.float32), jnp.asarray(x2[None], jnp.float32)
    )
    F = np.asarray(F[0])
    valid = np.asarray(valid[0])
    assert valid[0]
    # at least one solution must satisfy the epipolar constraint on fresh
    # points from the same pose
    xv1, xv2 = synthetic_correspondences(rng, R, t, 50)
    best = np.inf
    for i in range(3):
        if not valid[i]:
            continue
        err = np.asarray(
            geo.sampson_error(
                jnp.asarray(F[i], jnp.float32),
                jnp.asarray(xv1, jnp.float32),
                jnp.asarray(xv2, jnp.float32),
            )
        )
        best = min(best, float(np.sqrt(err).mean()))
    assert best < 1e-3, best


def test_fundamental_robust_w_outliers(rng):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(
        rng, R, t, 300, noise=5e-4, outlier_frac=0.4
    )
    N = 512
    mask = jnp.asarray(np.arange(N) < 300)
    cfg = RobustConfig(
        batch_hypotheses=256, max_batches=4, prosac=False,
        check_degeneracy=False, lo_refine=False,
    )
    res = robust.estimate_fundamental_robust(
        _pad(x1, N), _pad(x2, N), mask, None, cfg,
        jax.random.PRNGKey(0), threshold_sq=(2e-3) ** 2,
    )
    # should find the ~60% inlier structure
    assert int(res.n_inliers) > 120
    inl = np.asarray(res.inlier_mask)[:300]
    true_inl = np.ones(300, bool)
    true_inl[: int(0.4 * 300)] = True  # outlier indices were random; just
    # check most found inliers satisfy the true epipolar constraint
    E_true = geo.essential_from_rt(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    err = np.asarray(
        geo.sampson_error(
            E_true, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
        )
    )
    found = np.where(inl)[0]
    frac_true = (err[found] < (3e-3) ** 2).mean()
    assert frac_true > 0.9, frac_true


def test_rotation_only_robust(rng):
    R, _ = random_pose(rng, max_angle_deg=10.0)
    n = 200
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)],
        axis=1,
    )
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T  # pure rotation
    x2 = X2[:, :2] / X2[:, 2:3]
    x2 += rng.normal(scale=2e-4, size=x2.shape)
    # 30% outliers
    x2[:60] = rng.uniform(-0.5, 0.5, (60, 2))
    N = 256
    mask = jnp.asarray(np.arange(N) < n)
    cfg = RobustConfig(
        batch_hypotheses=128, max_batches=3, prosac=False,
        check_degeneracy=False, lo_refine=False,
    )
    res = robust.estimate_rotation_robust(
        _pad(x1, N), _pad(x2, N), mask, None, cfg,
        jax.random.PRNGKey(1), threshold_sq=(2e-3) ** 2,
    )
    R_est = np.asarray(res.model)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_est.T @ R) - 1) / 2, -1, 1))
    )
    assert int(res.n_inliers) > 100
    assert ang < 0.2, ang


@pytest.mark.parametrize("pure_rotation", [True, False])
def test_qdegsac_decision(rng, pure_rotation):
    R, t = random_pose(rng, max_angle_deg=10.0)
    n = 300
    if pure_rotation:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
             rng.uniform(4, 12, n)], axis=1,
        )
        x1 = X[:, :2] / X[:, 2:3]
        X2 = X @ R.T
        x2 = X2[:, :2] / X2[:, 2:3]
        x2 = x2 + rng.normal(scale=2e-4, size=x2.shape)
    else:
        x1, x2 = synthetic_correspondences(rng, R, t, n, noise=2e-4)
    N = 512
    mask = jnp.asarray(np.arange(N) < n)
    q = jnp.ones((N,), jnp.float32)
    cfg = RobustConfig(
        batch_hypotheses=256, max_batches=4, prosac=False,
        check_degeneracy=False,
    )
    out = robust.estimate_essential_qdegsac(
        _pad(x1, N), _pad(x2, N), mask, q, cfg,
        jax.random.PRNGKey(2), threshold_sq=(2e-3) ** 2,
    )
    assert bool(out.is_degenerate) == pure_rotation, float(out.rot_fraction)
    if not pure_rotation:
        # E from the non-degenerate path must match the true pose
        R_est, t_est, _, _, _ = geo.recover_pose(
            out.result.model, _pad(x1, N), _pad(x2, N), out.result.inlier_mask
        )
        rd, td, _ = geo.compare_poses(
            R_est, t_est, jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
        )
        assert float(rd) < 0.5 and float(td) < 2.0, (float(rd), float(td))


def test_eigensolver_noise_free(rng):
    R, t = random_pose(rng, max_angle_deg=15.0)
    x1, x2 = synthetic_correspondences(rng, R, t, 100)
    w = jnp.ones((100,), jnp.float32)
    res = eigensolver.solve_eigensolver(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), w
    )
    rd, td, _ = geo.compare_poses(
        res.R, res.t, jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    assert float(res.eigenvalue) < 1e-6
    assert float(rd) < 0.1, float(rd)
    assert float(td) < 1.0, float(td)


def test_eigensolver_refines_noisy_estimate(rng):
    R, t = random_pose(rng, max_angle_deg=15.0)
    x1, x2 = synthetic_correspondences(rng, R, t, 300, noise=5e-4)
    x1j = jnp.asarray(x1, jnp.float32)
    x2j = jnp.asarray(x2, jnp.float32)
    E_true = geo.essential_from_rt(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    # perturb the true E into a rough initial estimate
    E0 = E_true + 0.05 * jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    E0 = geo.closest_essential(E0)
    mask = jnp.ones((300,), bool)
    res = eigensolver.refine_essential_kneip(E0, x1j, x2j, mask)
    rd, td, _ = geo.compare_poses(
        res.R, res.t, jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    # must land close to truth despite the perturbed seed
    assert float(rd) < 0.3, float(rd)
    assert float(td) < 2.0, float(td)


def test_refine_linear_kneip_solver(rng):
    from matchinglib_poselib_tpu.config import (
        MinimalSolver, RefinementConfig,
    )
    from matchinglib_poselib_tpu.ops import refine

    R, t = random_pose(rng, max_angle_deg=15.0)
    x1, x2 = synthetic_correspondences(rng, R, t, 300, noise=3e-4)
    x1j = jnp.asarray(x1, jnp.float32)
    x2j = jnp.asarray(x2, jnp.float32)
    E_true = geo.essential_from_rt(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    E0 = geo.closest_essential(
        E_true + 0.03 * jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    )
    mask = jnp.ones((300,), bool)
    cfg = RefinementConfig(solver=MinimalSolver.KNEIP, iterations=6)
    out = refine.refine_essential_linear(
        E0, x1j, x2j, mask, jnp.asarray((2e-3) ** 2, jnp.float32), cfg
    )
    R_est, t_est, _, _, _ = geo.recover_pose(out.model, x1j, x2j, out.inlier_mask)
    rd, td, _ = geo.compare_poses(
        R_est, t_est, jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    assert int(out.n_inliers) > 250
    assert float(rd) < 0.3 and float(td) < 2.0, (float(rd), float(td))


def test_nomotion_robust(rng):
    """No-motion estimator entry: a static scene (x2 == x1 + noise) yields
    the identity model with high support; a moving scene yields low
    support (usac NoMotionEstimator menu parity, SURVEY.md P4)."""
    from matchinglib_poselib_tpu.config import RobustConfig
    from matchinglib_poselib_tpu.ops import robust

    n = 400
    x1 = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
    # static scene with 10% outliers
    x2 = x1 + rng.normal(scale=2e-4, size=(n, 2)).astype(np.float32)
    out_idx = rng.choice(n, 40, replace=False)
    x2[out_idx] += rng.uniform(0.05, 0.3, (40, 2)).astype(np.float32)
    cfg = RobustConfig()
    res = robust.estimate_nomotion_robust(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, jnp.float32), None,
        cfg, threshold_sq=jnp.asarray(1e-6, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(res.model), np.eye(3))
    assert int(res.n_inliers) >= 350
    assert float(res.inlier_ratio) > 0.85
    inl = np.asarray(res.inlier_mask)
    assert not inl[out_idx].any()

    # moving scene: no-motion support collapses
    R, t = random_pose(rng, max_angle_deg=10.0)
    x1m, x2m = synthetic_correspondences(rng, R, t, n, noise=1e-4)
    res_m = robust.estimate_nomotion_robust(
        jnp.asarray(x1m, jnp.float32), jnp.asarray(x2m, jnp.float32),
        jnp.ones(n, jnp.float32), None, cfg,
        threshold_sq=jnp.asarray(1e-6, jnp.float32),
    )
    assert float(res_m.inlier_ratio) < 0.3
