"""Rectification: row alignment, Q-matrix depth recovery, remap sampling.

The defining property (the reference's on-screen cursor check,
README.md:310-311, made quantitative): after rectification, corresponding
points of the two views share the same image row, and disparity maps to
depth through Q.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_pose
from matchinglib_poselib_tpu.ops import geometry as geo, rectify


K1 = np.array([[620.0, 0, 330.0], [0, 615.0, 245.0], [0, 0, 1.0]])
K2 = np.array([[605.0, 0, 315.0], [0, 600.0, 235.0], [0, 0, 1.0]])
HW = (480, 640)


def make_scene(rng, max_angle_deg=6.0, n=100):
    """Stereo-ish rig: mostly-horizontal baseline + small rotation."""
    R, _ = random_pose(rng, max_angle_deg=max_angle_deg)
    t = np.array([-0.54, 0.01, 0.005]) + rng.normal(scale=0.003, size=3)
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(4, 15, n)], axis=1,
    )
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    p1 = x1 @ K1[:2, :2].T + K1[:2, 2]
    p2 = x2 @ K2[:2, :2].T + K2[:2, 2]
    return R, t, X, p1, p2


def rectified_pixels(pts, K, Rrect, K_new):
    """Project original pixels through the rectifying homography."""
    h = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    Hm = np.asarray(K_new) @ np.asarray(Rrect) @ np.linalg.inv(K)
    q = h @ Hm.T
    return q[:, :2] / q[:, 2:3]


@pytest.mark.parametrize("mode", ["fusiello", "opencv"])
def test_rows_align_after_rectification(rng, mode):
    R, t, X, p1, p2 = make_scene(rng)
    if mode == "fusiello":
        rect = rectify.rectify_fusiello(
            jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        )
    else:
        rect = rectify.stereo_rectify(
            jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), HW,
        )
    q1 = rectified_pixels(p1, K1, rect.R1, rect.K_new1)
    q2 = rectified_pixels(p2, K2, rect.R2, rect.K_new2)
    rows_diff = np.abs(q1[:, 1] - q2[:, 1])
    assert np.max(rows_diff) < 0.1, f"max row misalignment {rows_diff.max()}"
    # disparity must be one-signed (points in front of both cameras)
    disp = q1[:, 0] - q2[:, 0]
    assert (disp > 0).all() or (disp < 0).all()


def test_q_matrix_recovers_depth(rng):
    R, t, X, p1, p2 = make_scene(rng)
    rect = rectify.stereo_rectify(
        jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), HW,
    )
    q1 = rectified_pixels(p1, K1, rect.R1, rect.K_new1)
    q2 = rectified_pixels(p2, K2, rect.R2, rect.K_new2)
    disp = q1[:, 0] - q2[:, 0]
    Q = np.asarray(rect.Q)
    vec = np.stack(
        [q1[:, 0], q1[:, 1], disp, np.ones_like(disp)], axis=1
    ) @ Q.T
    Z = vec[:, 2] / vec[:, 3]
    # depth in the rectified cam-1 frame == rotated original depth
    Xr = X @ np.asarray(rect.R1).T
    np.testing.assert_allclose(np.abs(Z), Xr[:, 2], rtol=0.02)


def test_rectifying_rotations_are_rotations(rng):
    R, t, _, _, _ = make_scene(rng)
    rect = rectify.rectify_fusiello(
        jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
    )
    for Rr in (np.asarray(rect.R1), np.asarray(rect.R2)):
        np.testing.assert_allclose(Rr @ Rr.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(Rr) - 1.0) < 1e-5


def test_optimal_focal_scale_bounds(rng):
    R, t, _, _, _ = make_scene(rng)
    s = rectify.optimal_focal_scale(
        jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.zeros(5, jnp.float32), jnp.zeros(5, jnp.float32), HW,
    )
    sv = float(s)
    assert 0.5 <= sv <= 2.0
    # the chosen scale keeps the border inside the sources
    rect = rectify.stereo_rectify(
        jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), HW, s,
    )
    border = np.array(
        [[0.0, 0.0], [639.0, 0.0], [0.0, 479.0], [639.0, 479.0]], np.float32
    )
    src = np.asarray(
        rectify.rectify_source_coords(
            jnp.asarray(border), jnp.asarray(K1, jnp.float32),
            jnp.zeros(5, jnp.float32), rect.R1, rect.K_new1,
        )
    )
    assert np.isfinite(src).all()


def test_rectified_image_identity():
    """Identity rig (R=I, K_new=K, no distortion) reproduces the image."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((64, 96)), jnp.float32)
    K = jnp.asarray([[80.0, 0, 48.0], [0, 80.0, 32.0], [0, 0, 1]], jnp.float32)
    out = rectify.rectified_image(
        img, K, jnp.zeros(5, jnp.float32), jnp.eye(3, dtype=jnp.float32), K,
        (64, 96),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_rectified_image_pair_photometric(rng):
    """Render a textured synthetic plane into both cameras; after remap,
    sampling each rectified image at a scene point's rectified pixel must
    return that point's texture value (the quantitative version of the
    reference's on-screen cursor check, README.md:310-311)."""
    R, t, _, _, _ = make_scene(rng, max_angle_deg=3.0)
    rect = rectify.stereo_rectify(
        jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), HW, 0.9,
    )
    # a fronto-parallel plane at depth Z0 with smooth texture
    Z0 = 8.0

    def texture(Xw):
        return (np.sin(1.5 * Xw[..., 0]) * np.cos(1.2 * Xw[..., 1])) * 0.5 + 0.5

    def render(K, Rc, tc):
        yy, xx = np.meshgrid(np.arange(HW[0]), np.arange(HW[1]), indexing="ij")
        pix = np.stack([xx, yy, np.ones_like(xx)], axis=-1).astype(np.float64)
        rays = pix @ np.linalg.inv(K).T  # cam coords, z=1
        # intersect with plane z=Z0 in world (cam1) frame: X = o + lam*(Rc^T d)
        d = rays @ Rc  # world direction (Rc^T d per pixel)
        o = -Rc.T @ tc
        lam = (Z0 - o[2]) / np.maximum(d[..., 2], 1e-9)
        Xw = o + lam[..., None] * d
        return texture(Xw).astype(np.float32)

    img1 = render(K1, np.eye(3), np.zeros(3))
    img2 = render(K2, R, t)
    r1 = np.asarray(rectify.rectified_image(
        jnp.asarray(img1), jnp.asarray(K1, jnp.float32),
        jnp.zeros(5, jnp.float32), rect.R1, rect.K_new1, HW,
    ))
    r2 = np.asarray(rectify.rectified_image(
        jnp.asarray(img2), jnp.asarray(K2, jnp.float32),
        jnp.zeros(5, jnp.float32), rect.R2, rect.K_new2, HW,
    ))

    # sample scene points on the plane, project into each ORIGINAL camera,
    # map through the rectifying homography, and read the rectified images
    n = 400
    Xw = np.stack(
        [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
         np.full(n, Z0)], axis=1,
    )
    tex = texture(Xw)

    def sample_bilinear(img, q):
        x, y = q[:, 0], q[:, 1]
        x0 = np.clip(np.floor(x).astype(int), 0, img.shape[1] - 2)
        y0 = np.clip(np.floor(y).astype(int), 0, img.shape[0] - 2)
        fx, fy = x - x0, y - y0
        return (
            img[y0, x0] * (1 - fx) * (1 - fy)
            + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy
            + img[y0 + 1, x0 + 1] * fx * fy
        )

    errs = []
    for (Rc, tc, K, rimg, Rr, Kn) in [
        (np.eye(3), np.zeros(3), K1, r1, rect.R1, rect.K_new1),
        (R, t, K2, r2, rect.R2, rect.K_new2),
    ]:
        Xc = Xw @ Rc.T + tc
        p = (Xc[:, :2] / Xc[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
        q = rectified_pixels(p, K, Rr, Kn)
        # only score points that land safely inside both images (remap fills
        # out-of-source pixels with 0)
        ok = (
            (p[:, 0] > 2) & (p[:, 0] < 637) & (p[:, 1] > 2) & (p[:, 1] < 477)
            & (q[:, 0] > 2) & (q[:, 0] < 637) & (q[:, 1] > 2) & (q[:, 1] < 477)
        )
        assert ok.sum() > 100
        vals = sample_bilinear(rimg, q[ok])
        errs.append(np.abs(vals - tex[ok]))
    err = np.concatenate(errs)
    assert np.median(err) < 0.01, f"median photometric error {np.median(err)}"
    assert np.mean(err) < 0.02, f"mean photometric error {np.mean(err)}"


def test_vergence_zero_for_parallel_rig():
    """A fronto-parallel rig (R = I, pure x baseline) has zero vergence."""
    R = np.eye(3)
    t = np.array([-0.54, 0.0, 0.0])
    rect = rectify.stereo_rectify(
        jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), HW,
    )
    v = rectify.estimate_vergence(
        jnp.asarray(R, jnp.float32), rect.R1, rect.R2, rect.P1, rect.P2
    )
    assert abs(int(v)) <= 1


def test_vergence_verging_rig(rng):
    """Cameras toed inward: vergence is positive and grows with the
    verging angle (estimateVergence, pose_helper.cpp:2505-2535)."""
    t = np.array([-0.54, 0.0, 0.0])
    vs = []
    for deg in (2.0, 5.0):
        a = np.deg2rad(deg)
        # rotate cam2 about +y toward cam1 (toe-in)
        R = np.array([
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)],
        ])
        rect = rectify.stereo_rectify(
            jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), HW,
            zero_disparity=False,
        )
        vs.append(int(rectify.estimate_vergence(
            jnp.asarray(R, jnp.float32), rect.R1, rect.R2, rect.P1,
            rect.P2,
        )))
    assert abs(vs[1]) > abs(vs[0]), f"vergence not increasing: {vs}"
    assert abs(vs[0]) > 0


def test_vergence_kitti_calib():
    """Bundled KITTI rig: near-parallel cameras -> small vergence."""
    import pathlib
    from matchinglib_poselib_tpu.utils import io as uio

    calib_path = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/"
        "imgs/stereo/calib_cam_to_cam.txt"
    )
    if not calib_path.exists():
        pytest.skip("reference stereo data not available")
    c = uio.load_kitti_calib(calib_path)
    rect = rectify.stereo_rectify(
        jnp.asarray(c.K0, jnp.float32), jnp.asarray(c.K1, jnp.float32),
        jnp.asarray(c.R, jnp.float32), jnp.asarray(c.t, jnp.float32),
        (512, 1392), zero_disparity=False,
    )
    v = int(rectify.estimate_vergence(
        jnp.asarray(c.R, jnp.float32), rect.R1, rect.R2, rect.P1, rect.P2
    ))
    assert abs(v) < 60, f"KITTI vergence unreasonable: {v}"
