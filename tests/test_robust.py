"""Tests for the batched robust estimation engine."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import random_pose, synthetic_correspondences
from matchinglib_poselib_tpu.config import RobustConfig, PoseEstimator, MinimalSolver
from matchinglib_poselib_tpu.ops import geometry as geo
from matchinglib_poselib_tpu.ops import robust


def _setup(rng, n=256, noise=0.0005, outlier_frac=0.4):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(
        rng, R, t, n, noise=noise, outlier_frac=outlier_frac
    )
    return (
        R,
        t,
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(n, jnp.float32),
    )


def _check_pose(R, t, E, x1, x2, mask, rtol_deg=1.0, ttol_deg=2.5):
    Rr, tr, _, _, _ = geo.recover_pose(E, x1, x2, mask)
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), Rr, tr
    )
    assert float(rdiff) < rtol_deg, f"rot err {float(rdiff)} deg"
    assert float(tang) < ttol_deg, f"trans err {float(tang)} deg"


CFG = RobustConfig(
    batch_hypotheses=128,
    max_batches=4,
    check_degeneracy=False,
    threshold_px=0.002,  # normalized-coords threshold for synthetic data
)


def test_ransac_essential_outliers(rng):
    R, t, x1, x2, mask = _setup(rng)
    key = jax.random.PRNGKey(0)
    res, _ = robust.estimate_essential_robust(x1, x2, mask, mask, CFG, key)
    assert float(res.inlier_ratio) > 0.5
    _check_pose(R, t, res.model, x1, x2, res.inlier_mask.astype(jnp.float32))


def test_ransac_prosac_quality_ordering(rng):
    R, t = random_pose(rng)
    n = 256
    x1, x2 = synthetic_correspondences(rng, R, t, n, noise=0.0005)
    # corrupt the LOW-quality half -> PROSAC should converge on good half
    x2[n // 2:] = rng.uniform(-0.6, 0.6, size=(n // 2, 2))
    quality = np.linspace(1.0, 0.0, n).astype(np.float32)
    key = jax.random.PRNGKey(1)
    res, _ = robust.estimate_essential_robust(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(n, jnp.float32),
        jnp.asarray(quality),
        CFG,
        key,
    )
    assert int(res.n_inliers) > 100
    _check_pose(
        R, t, res.model,
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        res.inlier_mask.astype(jnp.float32),
    )


def test_lmeds(rng):
    R, t, x1, x2, mask = _setup(rng, outlier_frac=0.3)
    cfg = RobustConfig(
        estimator=PoseEstimator.LMEDS,
        batch_hypotheses=128,
        max_batches=3,
        check_degeneracy=False,
        lo_refine=False,
    )
    res, _ = robust.estimate_essential_robust(
        x1, x2, mask, mask, cfg, jax.random.PRNGKey(2)
    )
    # LMEDS derives its own threshold band; inliers should be ~ the 70% good
    assert 0.4 < float(res.inlier_ratio) <= 1.0
    _check_pose(R, t, res.model, x1, x2, res.inlier_mask.astype(jnp.float32))


def test_masked_padding(rng):
    """Padded (masked-out) correspondences must not affect the result."""
    R, t, x1, x2, _ = _setup(rng, n=200)
    pad = 56
    x1p = jnp.concatenate([x1, jnp.zeros((pad, 2), jnp.float32)])
    x2p = jnp.concatenate([x2, jnp.ones((pad, 2), jnp.float32) * 5.0])
    mask = jnp.concatenate([jnp.ones(200), jnp.zeros(pad)]).astype(jnp.float32)
    res, _ = robust.estimate_essential_robust(
        x1p, x2p, mask, mask, CFG, jax.random.PRNGKey(3)
    )
    assert not bool(jnp.any(res.inlier_mask[200:]))
    _check_pose(R, t, res.model, x1p, x2p, res.inlier_mask.astype(jnp.float32))


def test_degeneracy_pure_rotation(rng):
    """Pure-rotation scene must be flagged degenerate."""
    R, _ = random_pose(rng, max_angle_deg=10.0)
    n = 256
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)],
        axis=1,
    )
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T  # t = 0
    x2 = X2[:, :2] / X2[:, 2:3]
    cfg = RobustConfig(
        batch_hypotheses=128, max_batches=3, check_degeneracy=True,
        threshold_px=0.002,
    )
    res, degen = robust.estimate_essential_robust(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, jnp.float32),
        cfg,
        jax.random.PRNGKey(4),
    )
    assert bool(degen.is_degenerate)
    assert float(degen.rot_fraction) > 0.8
    # the recovered rotation-only model should match R
    rdiff = geo.rotation_angle(
        jnp.swapaxes(degen.R_rotonly, -1, -2) @ jnp.asarray(R, jnp.float32)
    )
    assert float(rdiff) * 180 / np.pi < 0.5


def test_degeneracy_planar_scene(rng):
    """All-coplanar scene: dominant homography fraction ~ 1."""
    R, t = random_pose(rng)
    n = 256
    # points on a plane z = 8 + 0.3x + 0.2y
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 8.0 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
    X = np.concatenate([xy, z[:, None]], axis=1)
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    cfg = RobustConfig(
        batch_hypotheses=128, max_batches=3, check_degeneracy=True,
        threshold_px=0.002,
    )
    res, degen = robust.estimate_essential_robust(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, jnp.float32),
        cfg,
        jax.random.PRNGKey(5),
    )
    assert float(degen.h_fraction) > 0.8
    assert bool(degen.is_degenerate)


def test_no_motion_degeneracy(rng):
    n = 256
    x1 = rng.uniform(-0.5, 0.5, size=(n, 2))
    x2 = x1 + rng.normal(scale=1e-5, size=(n, 2))
    cfg = RobustConfig(
        batch_hypotheses=64, max_batches=2, check_degeneracy=True,
        threshold_px=0.002,
    )
    res, degen = robust.estimate_essential_robust(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, jnp.float32),
        cfg,
        jax.random.PRNGKey(6),
    )
    assert float(degen.static_fraction) > 0.9
    assert bool(degen.is_degenerate)


def test_sample_without_replacement_distinct(rng):
    key = jax.random.PRNGKey(7)
    pool = jnp.full((512,), 37, jnp.int32)
    idx = np.asarray(robust.sample_without_replacement(key, pool, 5, 256))
    assert idx.max() < 37
    assert idx.min() >= 0
    for row in idx:
        assert len(set(row.tolist())) == 5


def test_sample_small_pool(rng):
    key = jax.random.PRNGKey(8)
    pool = jnp.full((64,), 7, jnp.int32)
    idx = np.asarray(robust.sample_without_replacement(key, pool, 5, 256))
    assert idx.max() < 7
    for row in idx:
        assert len(set(row.tolist())) == 5


def test_8pt_family(rng):
    R, t, x1, x2, mask = _setup(rng, outlier_frac=0.3)
    cfg = RobustConfig(
        solver=MinimalSolver.EIGHT_PT,
        batch_hypotheses=256,
        max_batches=4,
        check_degeneracy=False,
        threshold_px=0.002,
    )
    res, _ = robust.estimate_essential_robust(
        x1, x2, mask, mask, cfg, jax.random.PRNGKey(9)
    )
    assert float(res.inlier_ratio) > 0.5
    _check_pose(R, t, res.model, x1, x2, res.inlier_mask.astype(jnp.float32))


def test_usac_observability_counters(rng):
    """UsacResults counter parity (USAC.h:18-60): models generated/rejected,
    points verified, LO count, per-degeneracy inlier counts."""
    R, t, x1, x2, mask = _setup(rng)
    cfg = RobustConfig(
        batch_hypotheses=128, max_batches=4, threshold_px=0.002,
        check_degeneracy=True,
    )
    res, degen = robust.estimate_essential_robust(
        x1, x2, mask, jnp.ones_like(mask), cfg, jax.random.PRNGKey(0)
    )
    n_gen = int(res.n_models_generated)
    n_rej = int(res.n_models_rejected)
    n_ver = int(res.n_points_verified)
    n_batches = int(res.n_batches)
    # models generated = batches * B * models-per-sample (Nister 5pt -> 10)
    assert n_gen == n_batches * 128 * 10
    assert 0 <= n_rej <= n_gen
    # dense engine verifies every valid point against every valid model
    assert n_ver == (n_gen - n_rej) * int(jnp.sum(mask))
    # LO ran and accepted at least one re-fit on this clean problem
    assert 0 <= int(res.n_lo_refinements) <= cfg.lo_inner_iterations
    # degeneracy family counts are consistent with their fractions
    n_inl = max(int(res.n_inliers), 1)
    assert int(degen.h_inliers) <= n_inl
    np.testing.assert_allclose(
        float(degen.rot_fraction), int(degen.rot_inliers) / n_inl, atol=1e-5
    )
    np.testing.assert_allclose(
        float(degen.static_fraction),
        int(degen.static_inliers) / n_inl, atol=1e-5,
    )
