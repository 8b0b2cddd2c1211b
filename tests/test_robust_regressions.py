"""Round-5 robustness regressions: the two silent-failure modes found by
adversarial per-frame sweeps on the KITTI pairs (PARITY_ACCURACY.md).

1. Prefix-bias early stop: a coherent WRONG structure occupying the top
   of the PROSAC quality ordering must not certify an early adaptive
   stop — the mixed-pool batches (half uniform over the full valid set)
   restore the stop criterion's evidence basis.
2. Manifold-projection support guard: when a refit chain drifts toward a
   fundamental-matrix solution whose essential projection collapses the
   inlier set, the engine must fall back to the (exactly essential)
   minimal-solver model with an honest mask — never return a model whose
   reported support its own classification contradicts.
3. closest_essential_fast == closest_essential (the SVD-free projection
   used inside the refit chains).
"""

import numpy as np
import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.config import PoseConfig, RobustConfig
from matchinglib_poselib_tpu.ops import geometry as geo, refine, robust

from conftest import random_pose, synthetic_correspondences


def _project(x1, R, t, depth):
    X = x1 * depth[:, None]
    X = np.concatenate([X, depth[:, None]], axis=1)
    X2 = X @ R.T + t
    return X2[:, :2] / X2[:, 2:3]


def test_biased_quality_prefix_does_not_certify_early_stop():
    """KITTI frame-7/key-7 regression (round 5): the 60 highest-quality
    slots follow a DIFFERENT (self-consistent) pose; the true pose owns
    the remaining 86% of the points. A PROSAC engine whose confidence
    stop counted prefix-restricted draws as full-population evidence
    locked onto the wrong structure and stopped."""
    rng = np.random.default_rng(5)
    R_true, t_true = random_pose(rng, max_angle_deg=8.0)
    R_bad, t_bad = random_pose(rng, max_angle_deg=25.0)

    n_all, n_bad = 420, 60
    x1 = np.stack([
        rng.uniform(-0.4, 0.4, n_all), rng.uniform(-0.3, 0.3, n_all)
    ], axis=1)
    depth = rng.uniform(4.0, 12.0, n_all)
    x2 = _project(x1, R_true, t_true, depth)
    # the decoy structure: same left points, right points from the OTHER
    # pose — coherent epipolar geometry, occupying the quality prefix
    x2[:n_bad] = _project(x1[:n_bad], R_bad, t_bad, depth[:n_bad])
    noise = 0.4 / 800.0
    x1 += rng.normal(scale=noise, size=x1.shape)
    x2 += rng.normal(scale=noise, size=x2.shape)
    quality = np.full(n_all, 0.2, np.float32)
    quality[:n_bad] = 0.9  # decoys rank first in the PROSAC ordering

    th = 1.2 / 800.0
    cfg = RobustConfig(batch_hypotheses=96, max_batches=12, threshold_px=th)
    res, _ = robust.estimate_essential_robust(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        jnp.ones(n_all, jnp.float32), jnp.asarray(quality),
        cfg, jax.random.PRNGKey(7), threshold_sq=th * th,
    )
    # the true structure has ~360 supporters; the decoy ~60. The engine
    # must find the majority structure despite the decoy prefix.
    assert int(res.n_inliers) > 250, (
        f"locked onto the decoy prefix: {int(res.n_inliers)} inliers"
    )
    # and the returned mask must agree with the returned model
    err = geo.sampson_error(res.model, jnp.asarray(x1, jnp.float32),
                            jnp.asarray(x2, jnp.float32))
    n_re = int(jnp.sum(err < res.threshold))
    assert abs(n_re - int(res.n_inliers)) <= 2


def test_lo_guard_never_loses_support_vs_ransac_winner():
    """The LO + projection exit of estimate_essential_robust must never
    return fewer inliers than the pre-LO ransac winner (the support
    guard restores the minimal-solver model on projection collapse)."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        R, t = random_pose(rng, max_angle_deg=12.0)
        x1, x2 = synthetic_correspondences(
            rng, R, t, 300, noise=0.5 / 800.0, outlier_frac=0.3
        )
        th = 0.8 / 800.0
        cfg_nolo = RobustConfig(batch_hypotheses=128, max_batches=4,
                                threshold_px=th, lo_refine=False)
        cfg_lo = RobustConfig(batch_hypotheses=128, max_batches=4,
                              threshold_px=th)
        key = jax.random.PRNGKey(100 + seed)
        r0, _ = robust.estimate_essential_robust(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            jnp.ones(len(x1), jnp.float32), None, cfg_nolo, key,
            threshold_sq=th * th,
        )
        r1, _ = robust.estimate_essential_robust(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            jnp.ones(len(x1), jnp.float32), None, cfg_lo, key,
            threshold_sq=th * th,
        )
        assert int(r1.n_inliers) >= int(r0.n_inliers), (
            f"seed {seed}: LO lost support "
            f"{int(r1.n_inliers)} < {int(r0.n_inliers)}"
        )


def test_refine_drift_guard_restores_projected_start():
    """refine_essential_linear's final projection is support-guarded:
    even if the IRLS chain produced a model whose projection loses the
    support, the result must classify at least half the starting band."""
    rng = np.random.default_rng(11)
    R, t = random_pose(rng, max_angle_deg=10.0)
    x1, x2 = synthetic_correspondences(
        rng, R, t, 400, noise=0.4 / 800.0, outlier_frac=0.2
    )
    E0 = geo.essential_from_rt(
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t / np.linalg.norm(t), jnp.float32),
    )
    th_sq = (0.8 / 800.0) ** 2
    err0 = geo.sampson_error(E0, jnp.asarray(x1, jnp.float32),
                             jnp.asarray(x2, jnp.float32))
    n0 = int(jnp.sum(err0 < th_sq))
    res = refine.refine_essential_linear(
        E0, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        jnp.ones(len(x1), jnp.float32), jnp.asarray(th_sq, jnp.float32),
    )
    assert int(res.n_inliers) >= n0 // 2
    # the model is on the essential manifold (two equal singular values,
    # third ~0)
    s = np.linalg.svd(np.asarray(res.model, np.float64), compute_uv=False)
    assert s[2] < 1e-4 * s[0]
    assert abs(s[0] - s[1]) < 1e-3 * s[0]


def test_closest_essential_fast_matches_svd_projection():
    """The SVD-free quadratic-polynomial projection equals the Jacobi-SVD
    projection across near-manifold and far-off-manifold inputs."""
    rng = np.random.default_rng(3)
    Es = []
    for _ in range(64):
        R, t = random_pose(rng, max_angle_deg=40.0)
        E = np.asarray(geo.essential_from_rt(
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t / np.linalg.norm(t), jnp.float32),
        ))
        E = E / np.linalg.norm(E)
        scale = rng.choice([0.0, 1e-6, 1e-4, 1e-2])
        Es.append((E + rng.normal(scale=scale, size=(3, 3))).astype(
            np.float32))
    Es = jnp.asarray(np.stack(Es))
    fast = np.asarray(geo.closest_essential_fast(Es))
    ref = np.asarray(geo.closest_essential(Es))
    np.testing.assert_allclose(fast, ref, atol=5e-6)
