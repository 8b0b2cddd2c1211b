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
