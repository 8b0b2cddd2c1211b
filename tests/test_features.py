"""Tests for the feature frontend (detection, orientation, descriptors)."""

import numpy as np
import jax.numpy as jnp

from matchinglib_poselib_tpu.config import DetectorConfig, DescriptorConfig
from matchinglib_poselib_tpu.ops import features, matching


def _square_grid(h=240, w=320, sq=14, pitch=32):
    """Isolated dark squares on white: every square corner is a FAST corner
    (checkerboard X-crossings are NOT — only 8 contiguous arc pixels)."""
    img = np.ones((h, w), np.float32)
    for y0 in range(pitch // 2, h - sq, pitch):
        for x0 in range(pitch // 2, w - sq, pitch):
            img[y0 : y0 + sq, x0 : x0 + sq] = 0.0
    return img


def _textured_image(rng, h=240, w=320):
    """Smooth random texture with corners (blurred noise + blobs)."""
    img = rng.normal(size=(h // 4, w // 4)).astype(np.float32)
    img = np.kron(img, np.ones((4, 4), np.float32))
    # cheap blur
    for _ in range(2):
        img = 0.25 * (
            np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        )
    img = (img - img.min()) / (img.max() - img.min())
    return img


def test_fast_detects_square_corners(rng):
    img = _square_grid()
    cfg = DetectorConfig(kind="FAST", max_keypoints=512, fast_threshold=20.0)
    kps = features.detect_keypoints(jnp.asarray(img), cfg)
    n = int(kps.n)
    assert n > 50, f"only {n} corners detected"
    # detected corners must lie near true square corners: squares start at
    # pitch/2 + k*pitch and have side sq -> corner coords in {16, 16+13}
    # mod 32 (x and y independently)
    xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
    rel = xy % 32
    near_corner = np.minimum.reduce(
        [np.abs(rel - 16), np.abs(rel - 16 - 13), np.abs(rel - 16 + 1),
         np.abs(rel - 16 + 14)]
    )
    assert np.percentile(near_corner.max(axis=1), 90) <= 3.0


def test_harris_and_shitomasi_run(rng):
    img = _textured_image(rng)
    for kind in ("HARRIS", "SHITOMASI"):
        cfg = DetectorConfig(kind=kind, max_keypoints=256)
        kps = features.detect_keypoints(jnp.asarray(img), cfg)
        assert int(kps.n) > 30, kind


def test_grid_capping_distributes(rng):
    """Grid selection must spread keypoints over the image (the purpose of
    responseFilterGridBased)."""
    img = _textured_image(rng)
    cfg = DetectorConfig(kind="SHITOMASI", max_keypoints=256)
    kps = features.detect_keypoints(jnp.asarray(img), cfg)
    xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
    # keypoints should appear in at least 3 of 4 quadrants
    h, w = img.shape
    quads = set()
    for x, y in xy:
        quads.add((int(x > w / 2), int(y > h / 2)))
    assert len(quads) >= 3


def test_orientation_rotates_with_image(rng):
    """Intensity-centroid angle must track a 90-degree rotation."""
    img = _textured_image(rng, 128, 128)
    patch = jnp.asarray(img[:31, :31])[None]
    a0 = float(features.orientation_ic(patch)[0])
    patch90 = jnp.asarray(np.rot90(np.asarray(patch[0])))[None]
    a90 = float(features.orientation_ic(patch90)[0])
    diff = (a90 - a0) % (2 * np.pi)
    # rot90 (counterclockwise in array space) shifts the centroid angle by
    # -pi/2 (mod 2pi)
    assert min(abs(diff - 3 * np.pi / 2), abs(diff - np.pi / 2)) < 0.2


def _detect_describe(img, binary=True, max_kp=512):
    dcfg = DetectorConfig(kind="FAST", max_keypoints=max_kp, fast_threshold=10.0)
    kps = features.detect_keypoints(jnp.asarray(img), dcfg)
    kind = "ORB" if binary else "SIFT"
    desc, kps = features.compute_descriptors(
        jnp.asarray(img), kps, DescriptorConfig(kind=kind)
    )
    return kps, desc


def test_descriptor_matching_under_shift(rng):
    """Descriptors must match across a small image translation."""
    img = _textured_image(rng, 256, 320)
    shift = 8
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    for binary in (True, False):
        kps1, d1 = _detect_describe(img, binary)
        kps2, d2 = _detect_describe(img2, binary)
        res = matching.match_descriptors(
            d1, d2, kps1.mask, kps2.mask,
            binary=binary, ratio_test=True, cross_check=True,
        )
        m = np.asarray(res.mask)
        assert m.sum() >= 30, f"binary={binary}: only {m.sum()} matches"
        # matched displacement must equal the shift for most matches
        p1 = np.asarray(kps1.xy)[m]
        p2 = np.asarray(kps2.xy)[np.asarray(res.idx)[m]]
        d = p2 - p1
        good = (np.abs(d - shift) <= 1.5).all(axis=1)
        assert good.mean() > 0.8, f"binary={binary}: {good.mean()} consistent"


def test_brief_rotation_invariance(rng):
    """Steered BRIEF must survive a 30-degree in-plane rotation (coarsely)."""
    import scipy.ndimage as ndi

    img = _textured_image(rng, 256, 256)
    img2 = ndi.rotate(img, 30.0, reshape=False, order=1)
    kps1, d1 = _detect_describe(img, True, 256)
    kps2, d2 = _detect_describe(img2, True, 256)
    res = matching.match_descriptors(
        d1, d2, kps1.mask, kps2.mask, binary=True,
        ratio_test=True, cross_check=True,
    )
    # ground-truth mapping: rotate kp1 coords by -30 deg about center
    th = np.deg2rad(-30.0)
    c = np.array([127.5, 127.5])
    Rm = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    m = np.asarray(res.mask)
    assert m.sum() >= 15
    p1 = np.asarray(kps1.xy)[m]
    p2 = np.asarray(kps2.xy)[np.asarray(res.idx)[m]]
    pred = (p1 - c) @ Rm.T + c
    good = (np.linalg.norm(pred - p2, axis=1) <= 3.0)
    assert good.mean() > 0.5, f"only {good.mean()} rotation-consistent"


def test_descriptors_on_reference_image():
    """Smoke test on the reference repo's bundled stereo pair."""
    import pathlib
    from matchinglib_poselib_tpu.utils import io

    d = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
    )
    if not d.exists():
        import pytest

        pytest.skip("reference images not available")
    img = io.load_image_gray(d / "left_0000000000.png")
    kps, desc = _detect_describe(img[:256, :512])
    assert int(kps.n) > 100
