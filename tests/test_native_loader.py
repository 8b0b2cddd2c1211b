"""Native C++ loader vs PIL: identical pixels on the real dataset.

The native path (native/loader.cpp) carries the reference io_data.cpp
role; PNG/PGM/PPM decodes must match PIL bit-for-bit (8-bit gray) or to
luma rounding (color)."""

import pathlib

import numpy as np
import pytest

from matchinglib_poselib_tpu import native

STEREO_DIR = pathlib.Path(
    "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
)
MATCH_DIR = pathlib.Path(
    "/root/reference/matchinglib_poselib/source/tests/matchinglib-test/imgs"
)


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native loader toolchain unavailable")


def _pil_gray(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.float32) / 255.0


@pytest.mark.skipif(not STEREO_DIR.exists(), reason="no reference data")
def test_png_matches_pil(lib_ok):
    path = STEREO_DIR / "left_0000000000.png"
    ours = native.load_image_gray(path)
    ref = _pil_gray(path)
    assert ours is not None
    assert ours.shape == ref.shape
    # 8-bit grayscale PNG: exact; color PNG: PIL's L uses the same BT.601
    # weights but integer rounding — allow half an 8-bit step
    assert np.abs(ours - ref).max() <= 0.5 / 255.0 + 1e-6


@pytest.mark.skipif(not MATCH_DIR.exists(), reason="no reference data")
def test_all_bundled_images_decode(lib_ok):
    pngs = sorted(MATCH_DIR.rglob("*.png")) + sorted(STEREO_DIR.glob("*.png"))
    assert pngs
    n_native = 0
    for p in pngs:
        out = native.load_image_gray(p)
        if out is None:
            continue  # unsupported encoding -> PIL fallback territory
        ref = _pil_gray(p)
        assert out.shape == ref.shape, p
        assert np.abs(out - ref).max() <= 1.5 / 255.0, p
        n_native += 1
    assert n_native >= len(pngs) * 0.8


def test_pnm_roundtrip(tmp_path, lib_ok, rng):
    data = (rng.random((37, 53)) * 255).astype(np.uint8)
    p5 = tmp_path / "x.pgm"
    p5.write_bytes(b"P5\n# c\n53 37\n255\n" + data.tobytes())
    out = native.load_image_gray(p5)
    np.testing.assert_allclose(out, data / 255.0, atol=1e-6)

    rgb = (rng.random((21, 33, 3)) * 255).astype(np.uint8)
    p6 = tmp_path / "x.ppm"
    p6.write_bytes(b"P6 33 21 255\n" + rgb.tobytes())
    out = native.load_image_gray(p6)
    luma = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ) / 255.0
    np.testing.assert_allclose(out, luma, atol=1e-5)


@pytest.mark.skipif(not STEREO_DIR.exists(), reason="no reference data")
def test_batch_loader_threads(lib_ok):
    paths = sorted(STEREO_DIR.glob("left_*.png"))
    ref0 = _pil_gray(paths[0])
    out, good = native.load_batch_gray(
        paths, ref0.shape[0], ref0.shape[1], n_threads=4
    )
    assert good == len(paths)
    for i, p in enumerate(paths):
        assert np.abs(out[i] - _pil_gray(p)).max() <= 1.5 / 255.0


def test_missing_file_returns_none(lib_ok):
    assert native.load_image_gray("/nonexistent/file.png") is None
