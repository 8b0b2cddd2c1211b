"""AutoThEpi threshold adaptation (pose_estim.cpp:82-300 parity).

A synthetic scene with known noise: starting from a badly chosen
threshold, the adapted threshold must move toward the noise level and the
pose must stay accurate."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import random_pose
from matchinglib_poselib_tpu.config import (
    MinimalSolver, PoseEstimator, RobustConfig,
)
from matchinglib_poselib_tpu.ops import geometry as geo, robust


def make_corrs(rng, noise=0.001, n_out=80, n_in=320, N=512):
    R, t = random_pose(rng, max_angle_deg=10.0)
    X = np.stack(
        [rng.uniform(-2, 2, n_in), rng.uniform(-1.5, 1.5, n_in),
         rng.uniform(4, 12, n_in)], axis=1,
    )
    x1 = X[:, :2] / X[:, 2:]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:] + rng.normal(scale=noise, size=(n_in, 2))
    x1o = rng.uniform(-0.5, 0.5, (n_out, 2))
    x2o = rng.uniform(-0.5, 0.5, (n_out, 2))
    x1 = np.concatenate([x1, x1o]).astype(np.float32)
    x2 = np.concatenate([x2, x2o]).astype(np.float32)
    mask = np.zeros(N, np.float32)
    mask[: n_in + n_out] = 1.0
    p = np.zeros((N, 2), np.float32)
    q = np.zeros((N, 2), np.float32)
    p[: n_in + n_out] = x1
    q[: n_in + n_out] = x2
    return R, t, p, q, mask


def run_autoth(rng, th0, noise=0.001):
    R, t, x1, x2, mask = make_corrs(rng, noise=noise)
    cfg = RobustConfig(
        estimator=PoseEstimator.RANSAC, batch_hypotheses=256, max_batches=4,
        check_degeneracy=False,
    )
    ath = robust.estimate_essential_autoth(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(mask),
        jnp.ones(len(x1), jnp.float32), cfg, jax.random.PRNGKey(0),
        threshold_sq=th0 * th0,
        min_threshold=0.25 / 800.0,
        max_threshold=2.0 / 800.0,
    )
    return R, t, ath


def test_autoth_tightens_loose_threshold(rng):
    """Start far too loose (2px @ f=800): adaptation must tighten, and the
    pose recovered from the final E must match ground truth.

    Noise is 0.4px so the adapted 3-sigma band (~1.2px) genuinely sits
    below the loose start — at the old 0.8px noise the correct adapted
    threshold IS ~2.3px and the pre-round-4 pass relied on the refit
    slightly over-fitting the noise (lower residual spread than the
    injected sigma); the hoisted-IRLS engine fits the true model more
    faithfully and exposed that.
    """
    th0 = 2.0 / 800.0
    R, t, x1, x2, mask = make_corrs(rng, noise=0.0005)
    cfg = RobustConfig(
        estimator=PoseEstimator.RANSAC, batch_hypotheses=256, max_batches=4,
        check_degeneracy=False,
    )
    ath = robust.estimate_essential_autoth(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(mask),
        jnp.ones(len(x1), jnp.float32), cfg, jax.random.PRNGKey(0),
        threshold_sq=th0 * th0,
        min_threshold=0.25 / 800.0,
        max_threshold=2.0 / 800.0,
    )
    # one adaptation round happens before the 0.67-inlier-ratio stop (the
    # reference's do/while exit); the threshold must move toward the noise
    assert float(ath.threshold) < th0 * 0.9
    Re, te, _, _, _ = geo.recover_pose(
        ath.result.model, jnp.asarray(x1), jnp.asarray(x2),
        ath.result.inlier_mask.astype(jnp.float32),
    )
    rd, td, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t / np.linalg.norm(t), jnp.float32),
        Re, te,
    )
    # ~0.8px-equivalent noise without linear refinement: ~1 deg accuracy
    assert float(rd) < 1.0
    assert float(td) < 4.0
    assert int(ath.result.n_inliers) > 200


def test_autoth_converges_and_latches(rng):
    th0 = 0.8 / 800.0
    R, t, ath = run_autoth(rng, th0)
    assert int(ath.n_rounds) <= 3
    # adapted threshold within the legal band
    assert 0.25 / 800.0 <= float(ath.threshold) <= 2.0 / 800.0


def test_autoth_threshold_tracks_noise(rng):
    """Higher noise -> higher adapted threshold."""
    _, _, ath_lo = run_autoth(rng, 0.8 / 800.0, noise=0.0005)
    _, _, ath_hi = run_autoth(rng, 0.8 / 800.0, noise=0.002)
    assert float(ath_hi.threshold) > float(ath_lo.threshold)
