"""Extended descriptors: ring-pattern (BRISK/FREAK), RIFF, BOLD.

Invariance/discrimination contract for every descriptor: same physical
point under a small viewpoint change -> small distance; different points
-> large distance. BOLD additionally: masked distance beats plain
Hamming under rotation."""

import numpy as np
import jax.numpy as jnp
import pytest

from matchinglib_poselib_tpu.ops import descriptors_ext as dx, features
from tests.test_subpix import analytic_texture


def _patches_at(img, pts, patch=31):
    return features.extract_patches(jnp.asarray(img), jnp.asarray(pts), patch)


def _hamming(a, b):
    x = np.bitwise_xor(np.asarray(a), np.asarray(b))
    return np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)


@pytest.fixture()
def scene(rng):
    img1 = analytic_texture(h=128, w=160)
    img2 = analytic_texture(h=128, w=160, dx=0.6, dy=-0.4)
    n = 48
    pts = np.stack(
        [rng.uniform(25, 135, n), rng.uniform(25, 100, n)], axis=1
    ).astype(np.float32)
    return img1, img2, pts


@pytest.mark.parametrize("log_spacing", [False, True])
def test_ring_descriptor_discriminates(scene, log_spacing):
    img1, img2, pts = scene
    p1 = _patches_at(img1, pts)
    p2 = _patches_at(img2, pts + [0.6, -0.4])
    ang = jnp.zeros(len(pts))
    d1 = dx.ring_pattern_descriptor(p1, ang, log_spacing=log_spacing)
    d2 = dx.ring_pattern_descriptor(p2, ang, log_spacing=log_spacing)
    same = _hamming(d1, d2)
    shuffled = _hamming(d1, np.roll(np.asarray(d2), 1, axis=0))
    # discrimination: unrelated points at least 2x the same-point distance
    assert np.median(same) < 110, f"same-point ham {np.median(same)}"
    assert np.median(shuffled) > 2 * np.median(same), (
        f"same {np.median(same)} vs shuffled {np.median(shuffled)}"
    )


def test_riff_descriptor_discriminates(scene):
    img1, img2, pts = scene
    p1 = _patches_at(img1, pts)
    p2 = _patches_at(img2, pts + [0.6, -0.4])
    ang = jnp.zeros(len(pts))
    d1 = np.asarray(dx.riff_descriptor(p1, ang))
    d2 = np.asarray(dx.riff_descriptor(p2, ang))
    np.testing.assert_allclose(
        np.linalg.norm(d1, axis=1), 1.0, atol=1e-3
    )  # unit norm
    same = np.linalg.norm(d1 - d2, axis=1)
    diff = np.linalg.norm(d1 - np.roll(d2, 1, axis=0), axis=1)
    assert np.median(same) < 0.3
    # smooth synthetic texture correlates distant points; 2x margin is the
    # discrimination contract
    assert np.median(diff) > 2 * np.median(same)


def test_riff_rotation_invariance(rng):
    """Oriented RIFF on a rotated patch must stay close to the original."""
    img = analytic_texture(h=128, w=160)
    pts = np.array([[60.0, 60.0], [90.0, 70.0]], np.float32)
    p = _patches_at(img, pts, patch=31)
    ang0 = jnp.zeros(2)
    d0 = np.asarray(dx.riff_descriptor(p, ang0))
    # simulate orientation change: descriptor computed with the angle the
    # estimator would report
    d_rot = np.asarray(dx.riff_descriptor(p, ang0 + 0.3))
    dist_same_cells = np.linalg.norm(d0 - d_rot, axis=1)
    # ring/sector binning rotates with the angle, so intensity means per
    # ring stay similar: distance well below unrelated-point level
    assert np.median(dist_same_cells) < 0.8


def test_bold_mask_improves_rotation_robustness(scene, rng):
    img1, _, pts = scene
    p1 = _patches_at(img1, pts)
    ang = jnp.zeros(len(pts))
    bits1, mask1 = dx.bold_descriptor(p1, ang)
    # descriptors of the same patches at a 10-degree orientation error
    bits2, mask2 = dx.bold_descriptor(p1, ang + jnp.deg2rad(10.0))
    m = np.asarray(mask1)
    frac_masked = np.unpackbits(m.view(np.uint8), axis=1).mean()
    assert 0.3 < frac_masked < 1.0  # masks actually drop unstable bits

    d_masked = np.diag(
        np.asarray(dx.bold_distance_matrix(bits1, mask1, bits2, mask2))
    )
    d_plain = _hamming(bits1, bits2).astype(np.float64) * 2.0  # two-way scale
    # normalized by active bit counts, the masked distance is tighter
    n_active = np.unpackbits(m.view(np.uint8), axis=1).sum(axis=1) + \
        np.unpackbits(np.asarray(mask2).view(np.uint8), axis=1).sum(axis=1)
    assert (d_masked / np.maximum(n_active, 1)).mean() < (
        d_plain / 1024.0
    ).mean()


def test_bold_matching_end_to_end(rng):
    # random smoothed texture: locally distinct everywhere (the analytic
    # texture is quasi-periodic and creates genuine look-alike patches)
    noise = rng.random((130, 162)).astype(np.float32)
    for _ in range(2):
        for ax in (0, 1):
            noise = (
                0.25 * np.roll(noise, 1, ax)
                + 0.5 * noise
                + 0.25 * np.roll(noise, -1, ax)
            )
    img1 = noise[1:129, 1:161]
    img2 = noise[0:128, 2:162]  # integer shift (+1, -1): exact resample
    n = 48
    pts = np.stack(
        [rng.uniform(25, 135, n), rng.uniform(25, 100, n)], axis=1
    ).astype(np.float32)
    p1 = _patches_at(img1, pts)
    p2 = _patches_at(img2, pts + [-1.0, 1.0])
    ang = jnp.zeros(len(pts))
    b1, m1 = dx.bold_descriptor(p1, ang)
    b2, m2 = dx.bold_descriptor(p2, ang)
    perm = np.random.default_rng(3).permutation(len(pts))
    b2p = jnp.asarray(np.asarray(b2)[perm])
    m2p = jnp.asarray(np.asarray(m2)[perm])
    res = dx.match_bold(
        b1, m1, b2p, m2p,
        jnp.ones(len(pts), bool), jnp.ones(len(pts), bool),
    )
    keep = np.asarray(res.mask)
    assert keep.mean() > 0.6
    expected = np.argsort(perm)
    assert (np.asarray(res.idx)[keep] == expected[keep]).mean() > 0.95


def test_registry_covers_reference_names():
    """Every descriptor name of the reference's factory maps to a real
    implementation kind (features.cpp:849-971 createExtractor list)."""
    names = [
        "BRISK", "ORB", "KAZE", "AKAZE", "FREAK", "DAISY", "LATCH",
        "BGM", "BGM_HARD", "BGM_BILINEAR", "LBGM", "BINBOOST_64",
        "BINBOOST_128", "BINBOOST_256", "VGG_120", "VGG_80", "VGG_64",
        "VGG_48", "SIFT", "SURF", "RIFF", "BOLD",
    ]
    for n in names:
        assert n in features.DESCRIPTOR_ALIASES, n
    assert features.is_bold_descriptor("BOLD")
    assert features.is_binary_descriptor("BRISK")
    assert not features.is_binary_descriptor("RIFF")


import pathlib

STEREO_DIR = pathlib.Path(
    "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
)


@pytest.mark.skipif(not STEREO_DIR.exists(), reason="no reference data")
@pytest.mark.parametrize("kind", ["BRISK", "FREAK", "RIFF", "BOLD"])
def test_pipeline_with_extended_descriptors(kind):
    """get_correspondences runs end-to-end with every extended kind on the
    real stereo pair and finds a sensible match set."""
    import jax.numpy as jnp

    from matchinglib_poselib_tpu.config import (
        DescriptorConfig, DetectorConfig, MatchingConfig,
    )
    from matchinglib_poselib_tpu.models import pipeline
    from matchinglib_poselib_tpu.utils import io

    img1 = jnp.asarray(io.load_image_gray(STEREO_DIR / "left_0000000000.png"))
    img2 = jnp.asarray(io.load_image_gray(STEREO_DIR / "right_0000000000.png"))
    corr = pipeline.get_correspondences(
        img1, img2,
        DetectorConfig(kind="FAST", max_keypoints=512, fast_threshold=12.0),
        DescriptorConfig(kind=kind),
        MatchingConfig(matcher_name="GMBSOF"),
    )
    n = int(corr.n)
    assert n > 60, f"{kind}: only {n} matches"
    m = np.asarray(corr.mask)
    flow = np.asarray(corr.pts2)[m] - np.asarray(corr.pts1)[m]
    # stereo rig: flow is mostly horizontal
    assert np.median(np.abs(flow[:, 1])) < 10.0
