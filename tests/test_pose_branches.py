"""End-to-end coverage of every PoseConfig branch through estimate_pose.

Round-1 verdict item 1: the autoTH branch shipped with an UnboundLocalError
because no test ever ran estimate_pose(auto_th=True) end-to-end. This module
runs the full pixel-in / pose-out entry (models/pipeline.py:estimate_pose)
for every {default, auto_th, use_halign} x {refine, ba} combination on
synthetic ground truth and asserts R/t accuracy, mirroring the reference's
poselib-test option matrix (tests/poselib-test/main.cpp --autoTH/--Halign/
--refineRT/--BART).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matchinglib_poselib_tpu.config import (
    BAConfig,
    PoseConfig,
    RefinementConfig,
    RobustConfig,
)
from matchinglib_poselib_tpu.models import pipeline
from matchinglib_poselib_tpu.ops import geometry as geo

from conftest import random_pose, synthetic_correspondences

F = 800.0
CX, CY = 320.0, 240.0
K = np.array([[F, 0, CX], [0, F, CY], [0, 0, 1.0]], np.float32)
DIST = np.zeros(5, np.float32)


def _planar_points(rng, R, t, normal, d, n):
    """Points on the plane normal^T X = d (cam-1 frame) seen by both views."""
    normal = np.asarray(normal, np.float64)
    normal = normal / np.linalg.norm(normal)
    a = np.cross(normal, [1.0, 0.0, 0.0])
    if np.linalg.norm(a) < 1e-6:
        a = np.cross(normal, [0.0, 1.0, 0.0])
    a /= np.linalg.norm(a)
    b = np.cross(normal, a)
    uv = rng.uniform(-3.0, 3.0, size=(n, 2))
    X = d * normal + uv[:, :1] * a + uv[:, 1:] * b
    X = X[X[:, 2] > 0.5]
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    return x1, x2


def _pixel_correspondences(seed=3, n=320, noise_px=0.4, outlier_frac=0.25,
                           planar=False):
    rng = np.random.default_rng(seed)
    R, t = random_pose(rng, max_angle_deg=15.0)
    if planar:
        # plane-dominated scene: the reference's Halign path fails on general
        # scenes (estimatePoseHomographies returns nonzero; poselib-test
        # main.cpp:1626 skips the pair), so the parity test uses two planes.
        # Both planes must actually be REPRESENTED: a near-single-plane
        # scene sits on the homography twofold-ambiguity manifold where no
        # estimator can pick the right (R, t) branch from the data (the
        # round-4 fixture truncated plane B to ~6% of the points and the
        # test passed only by which basin the fallback happened to hit)
        x1a, x2a = _planar_points(rng, R, t, [0.05, 0.05, 1.0], 6.0, n)
        x1b, x2b = _planar_points(rng, R, t, [0.5, 0.0, 0.9], 9.0, n)
        na = 2 * n // 3
        x1 = np.concatenate([x1a[:na], x1b[:n - na]])
        x2 = np.concatenate([x2a[:na], x2b[:n - na]])
        n = x1.shape[0]
        x1 = x1 + rng.normal(scale=noise_px / F, size=x1.shape)
        x2 = x2 + rng.normal(scale=noise_px / F, size=x2.shape)
        n_out = int(outlier_frac * n)
        idx = rng.choice(n, n_out, replace=False)
        x2[idx] = rng.uniform(-0.4, 0.4, size=(n_out, 2))
    else:
        x1, x2 = synthetic_correspondences(
            rng, R, t, n, noise=noise_px / F, outlier_frac=outlier_frac
        )
    pts1 = (x1 * F + np.array([CX, CY])).astype(np.float32)
    pts2 = (x2 * F + np.array([CX, CY])).astype(np.float32)
    mask = np.ones(n, bool)
    quality = rng.uniform(0.3, 1.0, n).astype(np.float32)
    return R, t, pts1, pts2, mask, quality


ROBUST = RobustConfig(batch_hypotheses=192, max_batches=4)

BRANCHES = {
    "default": PoseConfig(robust=ROBUST),
    "default_noref": PoseConfig(
        robust=ROBUST, refine=RefinementConfig(enabled=False)
    ),
    "default_ba": PoseConfig(robust=ROBUST, ba=BAConfig(enabled=True, iterations=10)),
    "auto_th": PoseConfig(robust=ROBUST, auto_th=True),
    "auto_th_noref": PoseConfig(
        robust=ROBUST, auto_th=True, refine=RefinementConfig(enabled=False)
    ),
    "auto_th_ba": PoseConfig(
        robust=ROBUST, auto_th=True, ba=BAConfig(enabled=True, iterations=10)
    ),
    "halign": PoseConfig(robust=ROBUST, use_halign=True),
    "halign_ba": PoseConfig(
        robust=ROBUST, use_halign=True, ba=BAConfig(enabled=True, iterations=10)
    ),
}


@pytest.mark.parametrize("name", sorted(BRANCHES))
def test_estimate_pose_branch(name):
    cfg = BRANCHES[name]
    R_gt, t_gt, pts1, pts2, mask, quality = _pixel_correspondences(
        planar="halign" in name, outlier_frac=0.15 if "halign" in name else 0.25
    )
    pose = pipeline.estimate_pose(
        jnp.asarray(pts1), jnp.asarray(pts2),
        jnp.asarray(mask), jnp.asarray(quality),
        jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(DIST), jnp.asarray(DIST),
        cfg, jax.random.PRNGKey(11),
    )
    n_inl = int(pose.n_inliers)
    assert n_inl > 100, f"{name}: only {n_inl} inliers"
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32),
        pose.R, pose.t,
    )
    # Halign solves a general (non-planar) scene via plane peeling, so it is
    # intrinsically less exact here; the direct branches must be tight.
    r_tol, t_tol = (3.0, 10.0) if "halign" in name else (1.0, 4.0)
    assert float(rdiff) < r_tol, f"{name}: R err {float(rdiff)} deg"
    assert float(tang) < t_tol, f"{name}: t err {float(tang)} deg"
    assert np.isfinite(np.asarray(pose.E)).all()


def test_auto_th_adapts_to_noise():
    """autoTH must recover a usable pose when the fixed 0.8px threshold is
    far too tight for the actual noise level (the AutoThEpi use-case,
    pose_estim.cpp:82-300)."""
    rng = np.random.default_rng(7)
    R_gt, t_gt = random_pose(rng, max_angle_deg=12.0)
    noise_px = 1.6  # well above the 0.8px start threshold
    x1, x2 = synthetic_correspondences(
        rng, R_gt, t_gt, 400, noise=noise_px / F, outlier_frac=0.15
    )
    pts1 = (x1 * F + np.array([CX, CY])).astype(np.float32)
    pts2 = (x2 * F + np.array([CX, CY])).astype(np.float32)
    mask = np.ones(400, bool)
    quality = rng.uniform(0.3, 1.0, 400).astype(np.float32)
    args = (
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(mask),
        jnp.asarray(quality), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(DIST), jnp.asarray(DIST),
    )
    fixed = pipeline.estimate_pose(
        *args, PoseConfig(robust=ROBUST), jax.random.PRNGKey(2)
    )
    auto = pipeline.estimate_pose(
        *args, PoseConfig(robust=ROBUST, auto_th=True), jax.random.PRNGKey(2)
    )
    # threshold adaptation must find (substantially) more support
    assert int(auto.n_inliers) > int(fixed.n_inliers)
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32),
        auto.R, auto.t,
    )
    assert float(rdiff) < 1.5
    assert float(tang) < 6.0
