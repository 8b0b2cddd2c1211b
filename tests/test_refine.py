"""Tests for IRLS linear refinement."""

import numpy as np
import jax.numpy as jnp

from conftest import random_pose, synthetic_correspondences
from matchinglib_poselib_tpu.config import RefinementConfig, RefineWeights
from matchinglib_poselib_tpu.ops import geometry as geo
from matchinglib_poselib_tpu.ops import refine


def test_refine_improves_noisy_model(rng):
    R, t = random_pose(rng)
    E_true = np.asarray(geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t)))
    n = 512
    x1, x2 = synthetic_correspondences(rng, R, t, n, noise=0.0005)
    # perturb the true model
    E0 = E_true + rng.normal(scale=0.02, size=(3, 3))
    E0 /= np.linalg.norm(E0)
    th = jnp.asarray(0.002**2, jnp.float32)
    x1j = jnp.asarray(x1, jnp.float32)
    x2j = jnp.asarray(x2, jnp.float32)
    mask = jnp.ones(n, jnp.float32)

    err_before = float(jnp.mean(geo.sampson_error(jnp.asarray(E0, jnp.float32), x1j, x2j)))
    res = refine.refine_essential_linear(
        jnp.asarray(E0, jnp.float32), x1j, x2j, mask, th
    )
    err_after = float(res.mean_sampson)
    assert err_after < err_before * 0.1
    assert int(res.n_inliers) > 0.9 * n

    Rr, tr, _, _, _ = geo.recover_pose(
        res.model, x1j, x2j, res.inlier_mask.astype(jnp.float32)
    )
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), Rr, tr
    )
    assert float(rdiff) < 0.2
    assert float(tang) < 0.5


def test_refine_with_outliers_shrinking_band(rng):
    R, t = random_pose(rng)
    n = 512
    x1, x2 = synthetic_correspondences(rng, R, t, n, noise=0.0005, outlier_frac=0.3)
    E_true = np.asarray(geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t)))
    # post-RANSAC-grade initial model: small perturbation that still
    # classifies most true inliers correctly (the refinement contract)
    E0 = E_true + rng.normal(scale=0.002, size=(3, 3))
    E0 /= np.linalg.norm(E0)
    th = jnp.asarray(0.002**2, jnp.float32)
    res = refine.refine_essential_linear(
        jnp.asarray(E0, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(n, jnp.float32),
        th,
        RefinementConfig(weights=RefineWeights.PSEUDO_HUBER),
    )
    # ~70% are inliers; refinement should keep most of them
    assert int(res.n_inliers) > 0.6 * n
    assert float(res.mean_sampson) < float(th)


def test_refine_all_weight_kinds(rng):
    R, t = random_pose(rng)
    n = 256
    x1, x2 = synthetic_correspondences(rng, R, t, n, noise=0.0003)
    E_true = np.asarray(geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t)))
    E0 = (E_true + rng.normal(scale=0.005, size=(3, 3))).astype(np.float32)
    th = jnp.asarray(0.002**2, jnp.float32)
    for kind in RefineWeights:
        res = refine.refine_essential_linear(
            jnp.asarray(E0),
            jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32),
            jnp.ones(n, jnp.float32),
            th,
            RefinementConfig(weights=kind),
        )
        assert int(res.n_inliers) > 0.85 * n, kind


def test_polish_iterative_beats_single_round(rng):
    """Re-selection rounds walk pose+support to a joint fixed point.

    Start from a biased inlier subset (only half the true inliers, chosen
    from one side of the image) and a perturbed pose: a single polish
    converges onto that subset's minimum; the iterated variant re-selects
    support from all valid matches and must end strictly closer to the
    true pose (the KITTI mechanism behind PARITY_ACCURACY.md).
    """
    import jax

    R, t = random_pose(rng)
    n = 1024
    x1, x2 = synthetic_correspondences(
        rng, R, t, n, noise=0.0008, outlier_frac=0.2
    )
    x1j = jnp.asarray(x1, jnp.float32)
    x2j = jnp.asarray(x2, jnp.float32)
    th = jnp.asarray(0.003**2, jnp.float32)
    Rj = jnp.asarray(R, jnp.float32)
    tj = jnp.asarray(t, jnp.float32)

    # perturbed init (about 2-3 deg off)
    drot = jnp.asarray(rng.normal(scale=0.02, size=3), jnp.float32)
    R0 = Rj @ refine._exp_so3(drot)
    t0 = tj + jnp.asarray(rng.normal(scale=0.05, size=3), jnp.float32)
    t0 = t0 / jnp.linalg.norm(t0)

    # biased initial support: true inliers with x1[:, 0] below the median
    err_true = geo.sampson_error(geo.essential_from_rt(Rj, tj), x1j, x2j)
    true_inl = np.asarray(err_true < float(th))
    xmed = np.median(x1[true_inl, 0])
    w0 = jnp.asarray(true_inl & (x1[:, 0] < xmed), jnp.float32)
    valid = jnp.ones(n, jnp.float32)

    single = refine.polish_pose_sampson(R0, t0, x1j, x2j, w0, th,
                                        iterations=25)
    multi, inl_multi = refine.polish_pose_iterative(
        R0, t0, x1j, x2j, w0, valid, th, rounds=3, iterations=25
    )
    _, tang_single, _ = geo.compare_poses(Rj, tj, single.R, single.t)
    _, tang_multi, _ = geo.compare_poses(Rj, tj, multi.R, multi.t)
    # iterated support must grow past the biased half and tighten the pose
    assert int(jnp.sum(inl_multi)) > int(jnp.sum(w0))
    assert float(tang_multi) <= float(tang_single)
    assert float(tang_multi) < 1.0
