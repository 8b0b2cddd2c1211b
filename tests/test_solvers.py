"""Unit tests for batched minimal solvers on synthetic minimal problems."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_pose, synthetic_correspondences
from matchinglib_poselib_tpu.ops import geometry as geo
from matchinglib_poselib_tpu.ops import solvers

FIVEPT = {"stewenius": solvers.solve_5pt, "nister": solvers.solve_5pt_nister}


def _best_sampson(E, valid, x1, x2):
    """Min mean Sampson error over valid candidate models."""
    err = np.asarray(geo.sampson_error(E, jnp.asarray(x1)[None], jnp.asarray(x2)[None]))
    mean = err.mean(axis=-1)
    mean = np.where(np.asarray(valid), mean, np.inf)
    return mean.min(), int(np.argmin(mean))


@pytest.mark.parametrize("variant", sorted(FIVEPT))
def test_5pt_single(rng, variant):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(rng, R, t, 5)
    E, valid = FIVEPT[variant](
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
    )
    assert bool(np.asarray(valid).any())
    # verify one candidate explains extra correspondences from the same pose
    xv1, xv2 = synthetic_correspondences(rng, R, t, 100)
    best, _ = _best_sampson(E, valid, xv1.astype(np.float32), xv2.astype(np.float32))
    assert best < 1e-6, f"best validation Sampson err {best}"


@pytest.mark.parametrize("variant", sorted(FIVEPT))
def test_5pt_batch_success_rate(rng, variant):
    B = 64
    oks = 0
    Es, x1s, x2s, poses = [], [], [], []
    for _ in range(B):
        R, t = random_pose(rng)
        x1, x2 = synthetic_correspondences(rng, R, t, 5)
        xv1, xv2 = synthetic_correspondences(rng, R, t, 64)
        x1s.append(x1)
        x2s.append(x2)
        poses.append((xv1, xv2))
    X1 = jnp.asarray(np.stack(x1s), jnp.float32)
    X2 = jnp.asarray(np.stack(x2s), jnp.float32)
    E, valid = FIVEPT[variant](X1, X2)  # (B, 10, 3, 3)
    for b in range(B):
        xv1, xv2 = poses[b]
        best, _ = _best_sampson(
            E[b], valid[b], xv1.astype(np.float32), xv2.astype(np.float32)
        )
        if best < 1e-5:
            oks += 1
    # f32 end-to-end: expect the vast majority of minimal problems solved
    assert oks >= int(0.9 * B), f"only {oks}/{B} minimal problems solved"


@pytest.mark.parametrize("variant", sorted(FIVEPT))
def test_5pt_recovers_pose(rng, variant):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(rng, R, t, 5)
    E, valid = FIVEPT[variant](
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
    )
    xv1, xv2 = synthetic_correspondences(rng, R, t, 100)
    _, idx = _best_sampson(E, valid, xv1.astype(np.float32), xv2.astype(np.float32))
    Rr, tr, _, _, votes = geo.recover_pose(
        E[idx], jnp.asarray(xv1, jnp.float32), jnp.asarray(xv2, jnp.float32),
        jnp.ones(100),
    )
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), Rr, tr
    )
    assert float(rdiff) < 0.5
    assert float(tang) < 1.0


def test_8pt(rng):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(rng, R, t, 64)
    E, valid = solvers.solve_8pt(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
    )
    assert bool(valid)
    err = np.asarray(
        geo.sampson_error(E, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))
    )
    assert err.mean() < 1e-8


def test_8pt_weighted_downweights_outliers(rng):
    R, t = random_pose(rng)
    x1, x2 = synthetic_correspondences(rng, R, t, 128)
    x2o = x2.copy()
    x2o[:32] += rng.normal(scale=0.1, size=(32, 2))  # corrupt 25%
    w = np.ones(128, np.float32)
    w[:32] = 0.0
    E, _ = solvers.solve_8pt(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2o, jnp.float32),
        weights=jnp.asarray(w),
    )
    err = np.asarray(
        geo.sampson_error(
            E, jnp.asarray(x1[32:], jnp.float32), jnp.asarray(x2[32:], jnp.float32)
        )
    )
    assert err.mean() < 1e-7


def test_homography(rng):
    H_true = np.array(
        [[1.1, 0.05, 0.02], [-0.03, 0.95, -0.01], [0.02, -0.01, 1.0]]
    )
    x1 = rng.uniform(-1, 1, size=(32, 2))
    h1 = np.concatenate([x1, np.ones((32, 1))], axis=1)
    p = h1 @ H_true.T
    x2 = p[:, :2] / p[:, 2:3]
    H, valid = solvers.solve_homography(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
    )
    assert bool(valid)
    err = np.asarray(
        solvers.homography_transfer_error(
            H, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
        )
    )
    assert err.max() < 1e-7


def test_homography_minimal_4pt(rng):
    H_true = np.array([[0.9, 0.1, 0.05], [0.02, 1.05, -0.03], [0.01, 0.02, 1.0]])
    x1 = rng.uniform(-1, 1, size=(4, 2))
    h1 = np.concatenate([x1, np.ones((4, 1))], axis=1)
    p = h1 @ H_true.T
    x2 = p[:, :2] / p[:, 2:3]
    H, valid = solvers.solve_homography(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
    )
    assert bool(valid)
    Hn = np.asarray(H) / np.asarray(H)[2, 2]
    np.testing.assert_allclose(Hn, H_true / H_true[2, 2], atol=1e-3)
