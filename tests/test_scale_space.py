"""Tests for scale-space detectors (SIFT/SURF/STAR/MSD/MSER, pyramid FAST)
and the KAZE/AKAZE nonlinear-diffusion family."""

import numpy as np
import pytest

import jax.numpy as jnp

from matchinglib_poselib_tpu.config import DetectorConfig, DescriptorConfig
from matchinglib_poselib_tpu.ops import features, matching, scale_space


def _blob_image(h=192, w=256):
    """White background with dark Gaussian blobs of two radii."""
    img = np.ones((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    blobs = [(48, 64, 3.0), (48, 160, 3.0), (120, 64, 7.0), (120, 192, 7.0),
             (160, 128, 3.0)]
    for cy, cx, s in blobs:
        img -= 0.9 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return np.clip(img, 0, 1), blobs


def _corner_texture(rng, h=192, w=256):
    img = rng.normal(size=(h // 4, w // 4)).astype(np.float32)
    img = np.kron(img, np.ones((4, 4), np.float32))
    for _ in range(2):
        img = 0.25 * (np.roll(img, 1, 0) + np.roll(img, -1, 0)
                      + np.roll(img, 1, 1) + np.roll(img, -1, 1))
    return (img - img.min()) / (img.max() - img.min())


def _dist_to_blobs(kps, blobs):
    xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
    cts = np.array([(cx, cy) for cy, cx, _ in blobs], np.float32)
    d = np.linalg.norm(xy[:, None] - cts[None], axis=-1)
    return d.min(axis=1), xy


@pytest.mark.parametrize("kind", ["SIFT", "SURF", "MSER", "KAZE", "AKAZE"])
def test_blob_detectors_find_blobs(kind):
    img, blobs = _blob_image()
    cfg = DetectorConfig(kind=kind, max_keypoints=64)
    kps = features.detect_keypoints(jnp.asarray(img), cfg)
    n = int(kps.n)
    assert n >= 5, f"{kind}: only {n} keypoints"
    # every blob center must be recovered by one of the top keypoints
    xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
    cts = np.array([(cx, cy) for cy, cx, _ in blobs], np.float32)
    d_blob_to_kp = np.linalg.norm(cts[:, None] - xy[None], axis=-1).min(1)
    assert d_blob_to_kp.max() <= 3.0, f"{kind}: blob misses {d_blob_to_kp}"


def test_sift_scale_estimates_track_blob_size():
    img, blobs = _blob_image()
    kps = scale_space.sift_dog_keypoints(jnp.asarray(img), 64)
    mask = np.asarray(kps.mask)
    xy = np.asarray(kps.xy)[mask]
    scale = np.asarray(kps.scale)[mask]
    small = [(cy, cx) for cy, cx, s in blobs if s == 3.0]
    big = [(cy, cx) for cy, cx, s in blobs if s == 7.0]

    def nearest_scale(cy, cx):
        d = np.linalg.norm(xy - np.array([cx, cy]), axis=-1)
        return scale[np.argmin(d)]

    s_small = np.mean([nearest_scale(cy, cx) for cy, cx in small])
    s_big = np.mean([nearest_scale(cy, cx) for cy, cx in big])
    assert s_big > s_small, (s_small, s_big)


def test_star_and_msd_detect_structure(rng):
    img, blobs = _blob_image()
    for kind in ("STAR", "MSD"):
        cfg = DetectorConfig(kind=kind, max_keypoints=64)
        kps = features.detect_keypoints(jnp.asarray(img), cfg)
        assert int(kps.n) >= 4, kind
        d, _ = _dist_to_blobs(kps, blobs)
        # majority of detections near actual structure
        assert np.median(d) <= 12.0, (kind, np.median(d))


def test_pyramid_fast_multiscale(rng):
    img = _corner_texture(rng)
    cfg = DetectorConfig(
        kind="ORB", max_keypoints=256, pyramid_levels=4, pyramid_scale=1.3
    )
    kps = features.detect_keypoints(jnp.asarray(img), cfg)
    assert int(kps.n) > 50
    scales = np.asarray(kps.scale)[np.asarray(kps.mask)]
    assert scales.min() >= 1.0 and scales.max() > 1.0  # multiple levels used


@pytest.mark.parametrize(
    "desc_kind",
    ["AKAZE", "KAZE", "SURF", "DAISY", "LATCH", "BGM", "LBGM",
     "BINBOOST_64", "BINBOOST_128", "BINBOOST_256", "VGG_120", "VGG_48"],
)
def test_new_descriptors_match_under_shift(rng, desc_kind):
    """Descriptors computed on an image and its shifted copy must match at
    the true correspondence (ratio-test 2-NN matching finds the shift)."""
    img = _corner_texture(rng)
    dy, dx = 5, 9
    img2 = np.roll(img, (dy, dx), (0, 1))
    det = DetectorConfig(kind="FAST", max_keypoints=256, fast_threshold=8.0)
    dcfg = DescriptorConfig(kind=desc_kind, oriented=False)
    kp1 = features.detect_keypoints(jnp.asarray(img), det)
    kp2 = features.detect_keypoints(jnp.asarray(img2), det)
    d1, kp1 = features.compute_descriptors(jnp.asarray(img), kp1, dcfg)
    d2, kp2 = features.compute_descriptors(jnp.asarray(img2), kp2, dcfg)
    binary = features.is_binary_descriptor(desc_kind)
    res = matching.match_descriptors(
        d1, d2, kp1.mask, kp2.mask, binary=binary, ratio=0.9
    )
    m = np.asarray(res.mask)
    x1 = np.asarray(kp1.xy)[m]
    x2 = np.asarray(kp2.xy)[np.asarray(res.idx)[m]]
    flow = x2 - x1
    good = (np.abs(flow[:, 0] - dx) <= 2) & (np.abs(flow[:, 1] - dy) <= 2)
    n, frac = m.sum(), good.mean() if m.sum() else 0.0
    assert n >= 20, f"{desc_kind}: only {n} matches"
    assert frac >= 0.5, f"{desc_kind}: inlier fraction {frac:.2f}"


def test_mldb_rotation_invariance(rng):
    from matchinglib_poselib_tpu.ops import nonlinear_diffusion as nd
    from scipy import ndimage

    img = _corner_texture(rng)
    ang = 30.0
    img_r = ndimage.rotate(img, ang, reshape=False, order=1, mode="nearest")
    h, w = img.shape
    cy, cx = h // 2, w // 2
    xy = jnp.asarray([[cx, cy]], jnp.float32)
    p1 = features.extract_patches(jnp.asarray(img), xy, 31)
    p2 = features.extract_patches(jnp.asarray(img_r), xy, 31)
    a1 = features.orientation_ic(p1)
    a2 = features.orientation_ic(p2)
    d1 = nd.mldb_descriptor(p1, a1)
    d2 = nd.mldb_descriptor(p2, a2)
    dist_rot = int(
        np.unpackbits(
            np.asarray(jnp.bitwise_xor(d1, d2)).view(np.uint8)
        ).sum()
    )
    # distance to a random other patch for contrast
    xy_o = jnp.asarray([[cx + 40, cy + 30]], jnp.float32)
    p3 = features.extract_patches(jnp.asarray(img), xy_o, 31)
    d3 = nd.mldb_descriptor(p3, features.orientation_ic(p3))
    dist_other = int(
        np.unpackbits(
            np.asarray(jnp.bitwise_xor(d1, d3)).view(np.uint8)
        ).sum()
    )
    assert dist_rot < dist_other, (dist_rot, dist_other)


def test_nonlinear_diffusion_preserves_edges_smooths_noise(rng):
    from matchinglib_poselib_tpu.ops import nonlinear_diffusion as nd

    # step edge + noise: diffusion must reduce noise variance much more
    # than it blurs the edge
    img = np.zeros((96, 96), np.float32)
    img[:, 48:] = 1.0
    noisy = img + rng.normal(scale=0.05, size=img.shape).astype(np.float32)
    levels = nd.nonlinear_scale_space(jnp.asarray(noisy))
    L_last = np.asarray(levels[-1][0])
    flat = slice(8, 40)
    noise_before = noisy[:, flat].std()
    noise_after = L_last[:, flat].std()
    edge_contrast = L_last[:, 58:88].mean() - L_last[:, 8:38].mean()
    assert noise_after < 0.5 * noise_before
    assert edge_contrast > 0.9


def test_detector_registry_covers_reference_names():
    """Every detector name in the reference's createDetector factory
    (features.cpp:792-847) resolves to an implemented family."""
    for name in ("FAST", "MSER", "ORB", "BRISK", "KAZE", "AKAZE", "SIFT",
                 "SURF", "STAR", "MSD"):
        assert name in features.DETECTOR_ALIASES
        cfg = DetectorConfig(kind=name, max_keypoints=64)
        img = jnp.asarray(_blob_image()[0])
        kps = features.detect_keypoints(img, cfg)
        assert kps.xy.shape == (64, 2), name
