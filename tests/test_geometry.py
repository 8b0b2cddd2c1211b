"""Unit tests for ops.geometry vs numpy/closed-form ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_pose, synthetic_correspondences
from matchinglib_poselib_tpu.ops import geometry as geo


def test_skew_and_essential(rng):
    t = rng.normal(size=3)
    S = np.asarray(geo.skew(jnp.asarray(t)))
    v = rng.normal(size=3)
    np.testing.assert_allclose(S @ v, np.cross(t, v), rtol=1e-5, atol=1e-6)

    R, t = random_pose(rng)
    E = np.asarray(geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t)))
    x1, x2 = synthetic_correspondences(rng, R, t, 50)
    h1 = np.concatenate([x1, np.ones((50, 1))], axis=1)
    h2 = np.concatenate([x2, np.ones((50, 1))], axis=1)
    resid = np.einsum("ni,ij,nj->n", h2, E, h1)
    assert np.max(np.abs(resid)) < 1e-4


def test_sampson_zero_on_perfect(rng):
    R, t = random_pose(rng)
    E = geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t))
    x1, x2 = synthetic_correspondences(rng, R, t, 100)
    err = np.asarray(geo.sampson_error(E, jnp.asarray(x1), jnp.asarray(x2)))
    assert np.max(err) < 1e-7


def test_sampson_detects_outliers(rng):
    R, t = random_pose(rng)
    E = geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t))
    x1, x2 = synthetic_correspondences(rng, R, t, 200, outlier_frac=0.5)
    err = np.asarray(geo.sampson_error(E, jnp.asarray(x1), jnp.asarray(x2)))
    inl = err < 1e-6
    # roughly half survive
    assert 80 <= inl.sum() <= 120


def test_quat_roundtrip(rng):
    for _ in range(20):
        R, _ = random_pose(rng, max_angle_deg=179.0)
        q = geo.quat_from_rot(jnp.asarray(R))
        R2 = np.asarray(geo.rot_from_quat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_batched(rng):
    Rs = np.stack([random_pose(rng)[0] for _ in range(8)])
    q = geo.quat_from_rot(jnp.asarray(Rs))
    R2 = np.asarray(geo.rot_from_quat(q))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)


def test_img_cam_roundtrip(rng):
    K = jnp.asarray([[720.0, 0.0, 320.5], [0.0, 700.0, 240.5], [0.0, 0.0, 1.0]])
    pts = jnp.asarray(rng.uniform(0, 640, size=(30, 2)))
    cam = geo.img_to_cam(pts, K)
    back = geo.cam_to_img(cam, K)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_undistort_roundtrip(rng):
    dist = jnp.asarray([-0.3, 0.1, 1e-3, -1e-3, 0.0])
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)))
    distorted = geo.distort_oulu(pts, dist)
    undist = geo.undistort_oulu(distorted, dist, iterations=30)
    np.testing.assert_allclose(np.asarray(undist), np.asarray(pts), atol=1e-5)


def test_masked_stats(rng):
    x = rng.normal(size=64).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:40] = True
    med, mean, std, mad = geo.masked_stats(jnp.asarray(x), jnp.asarray(mask))
    valid = x[:40]
    np.testing.assert_allclose(float(mean), valid.mean(), atol=1e-5)
    np.testing.assert_allclose(float(med), np.median(valid), atol=1e-5)
    np.testing.assert_allclose(float(std), valid.std(), atol=1e-5)
    np.testing.assert_allclose(
        float(mad), np.median(np.abs(valid - np.median(valid))), atol=1e-5
    )


def test_triangulate_recovers_points(rng):
    R, t = random_pose(rng)
    n = 60
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)],
        axis=1,
    )
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    Xr = np.asarray(
        geo.triangulate_linear(
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32),
        )
    )
    np.testing.assert_allclose(Xr, X, rtol=2e-2, atol=2e-2)


def test_recover_pose(rng):
    R, t = random_pose(rng)
    E = geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t))
    x1, x2 = synthetic_correspondences(rng, R, t, 100)
    mask = jnp.ones(100)
    Rr, tr, X, ok, votes = geo.recover_pose(
        E.astype(jnp.float32),
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        mask,
    )
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), Rr, tr
    )
    assert float(rdiff) < 0.2
    assert float(tang) < 0.5
    assert int(votes) > 90


def test_compare_poses_identity(rng):
    R, t = random_pose(rng)
    rdiff, tang, tdist = geo.compare_poses(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(R), jnp.asarray(t)
    )
    assert float(rdiff) < 1e-3
    assert float(tang) < 1e-2
    assert float(tdist) < 1e-4


def test_closest_essential(rng):
    R, t = random_pose(rng)
    E = np.asarray(geo.essential_from_rt(jnp.asarray(R), jnp.asarray(t)))
    En = E + rng.normal(scale=1e-3, size=(3, 3))
    Ec = geo.closest_essential(jnp.asarray(En))
    assert bool(geo.is_valid_essential(Ec))
    s = np.linalg.svd(np.asarray(Ec), compute_uv=False)
    assert abs(s[0] - s[1]) < 1e-4
    assert s[2] < 1e-5


def test_per_axis_angles_consistent_with_rotation_angle(rng):
    """Norm of per-axis Euler diffs ~ R_diffAll for small rotations.

    Guards the noMatch CSV columns against unit bugs (round 2 shipped the
    per-axis columns inflated 57.3x by a double degrees conversion).
    """
    from scipy.spatial.transform import Rotation

    for _ in range(10):
        # small random rotation (0.1-2 deg)
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.1, 2.0)
        R = Rotation.from_rotvec(np.radians(ang) * axis).as_matrix()
        euler = np.asarray(geo.angles_from_rot(jnp.asarray(R, jnp.float32)))
        total = float(geo.rotation_angle(jnp.asarray(R, jnp.float32)))
        total_deg = np.degrees(total)
        # for small angles, |euler|_2 ~ rotation angle (within 5%)
        assert abs(np.linalg.norm(euler) - total_deg) < 0.05 * total_deg + 1e-3
