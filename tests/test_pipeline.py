"""End-to-end pipeline tests on the reference repo's bundled stereo data.

This is the parity check of SURVEY.md §7's minimum slice: detect -> describe
-> match -> robust 5pt pose on the KITTI-calibrated stereo pair, compared
against the calibration extrinsics (the reference's own accuracy check:
poselib-test --compInitPose prints R/t differences vs calib, main.cpp).
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matchinglib_poselib_tpu.config import (
    DetectorConfig, DescriptorConfig, MatchingConfig, PoseConfig, RobustConfig,
)
from matchinglib_poselib_tpu.models import pipeline
from matchinglib_poselib_tpu.ops import geometry as geo
from matchinglib_poselib_tpu.utils import io

STEREO_DIR = pathlib.Path(
    "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
)

pytestmark = pytest.mark.skipif(
    not STEREO_DIR.exists(), reason="reference stereo data not available"
)


@pytest.fixture(scope="module")
def calib():
    return io.load_kitti_calib(STEREO_DIR / "calib_cam_to_cam.txt")


@pytest.fixture(scope="module")
def stereo_pair():
    img1 = io.load_image_gray(STEREO_DIR / "left_0000000000.png")
    img2 = io.load_image_gray(STEREO_DIR / "right_0000000000.png")
    return jnp.asarray(img1), jnp.asarray(img2)


def test_correspondences_on_stereo_pair(stereo_pair):
    img1, img2 = stereo_pair
    corr = pipeline.get_correspondences(
        img1, img2,
        DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0),
        DescriptorConfig(kind="ORB"),
        MatchingConfig(matcher_name="GMBSOF"),
    )
    n = int(corr.n)
    assert n > 200, f"only {n} correspondences"
    # stereo pair: flow should be mostly horizontal (epipolar-ish)
    m = np.asarray(corr.mask)
    flow = np.asarray(corr.pts2)[m] - np.asarray(corr.pts1)[m]
    assert np.median(np.abs(flow[:, 1])) < 10.0


def test_pose_matches_calibration(stereo_pair, calib):
    img1, img2 = stereo_pair
    corr = pipeline.get_correspondences(
        img1, img2,
        DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0),
        DescriptorConfig(kind="ORB"),
        MatchingConfig(matcher_name="GMBSOF"),
    )
    pose_cfg = PoseConfig(
        robust=RobustConfig(batch_hypotheses=256, max_batches=6)
    )
    pose = pipeline.estimate_pose(
        corr.pts1, corr.pts2, corr.mask, corr.quality,
        jnp.asarray(calib.K0, jnp.float32),
        jnp.asarray(calib.K1, jnp.float32),
        jnp.asarray(calib.dist0, jnp.float32),
        jnp.asarray(calib.dist1, jnp.float32),
        pose_cfg,
        jax.random.PRNGKey(0),
    )
    assert int(pose.n_inliers) > 100
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(calib.R, jnp.float32),
        jnp.asarray(calib.t, jnp.float32),
        pose.R, pose.t,
    )
    # reference parity: poselib-test reports sub-degree rotation agreement
    # with calib on this data; translation direction is noisier per-pair
    assert float(rdiff) < 1.0, f"rotation error {float(rdiff)} deg"
    assert float(tang) < 5.0, f"translation direction error {float(tang)} deg"


def test_pose_consistency_across_frames(calib):
    """Pose must be stable across different frames of the same rig."""
    pose_cfg = PoseConfig(robust=RobustConfig(batch_hypotheses=256, max_batches=4))
    poses = []
    for idx in (1, 5):
        img1 = jnp.asarray(io.load_image_gray(STEREO_DIR / f"left_{idx:010d}.png"))
        img2 = jnp.asarray(io.load_image_gray(STEREO_DIR / f"right_{idx:010d}.png"))
        corr = pipeline.get_correspondences(
            img1, img2,
            DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0),
            DescriptorConfig(kind="ORB"),
            MatchingConfig(matcher_name="GMBSOF"),
        )
        pose = pipeline.estimate_pose(
            corr.pts1, corr.pts2, corr.mask, corr.quality,
            jnp.asarray(calib.K0, jnp.float32),
            jnp.asarray(calib.K1, jnp.float32),
            jnp.asarray(calib.dist0, jnp.float32),
            jnp.asarray(calib.dist1, jnp.float32),
            pose_cfg,
            jax.random.PRNGKey(idx),
        )
        poses.append(pose)
    rdiff, tang, _ = geo.compare_poses(
        poses[0].R, poses[0].t, poses[1].R, poses[1].t
    )
    # single-pair estimates carry ~0.5 deg rot / ~2-4 deg trans noise each
    # (the streaming refiner, not single pairs, delivers calib-grade poses)
    assert float(rdiff) < 1.5
    assert float(tang) < 8.0


def test_pose_with_ba_refinement(stereo_pair, calib):
    """BART path: BA after pose recovery must not degrade (and usually
    tightens) the calib agreement; guards protect against divergence."""
    from matchinglib_poselib_tpu.config import BAConfig

    img1, img2 = stereo_pair
    corr = pipeline.get_correspondences(
        img1, img2,
        DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0),
        DescriptorConfig(kind="ORB"),
        MatchingConfig(matcher_name="GMBSOF"),
    )
    args = (
        corr.pts1, corr.pts2, corr.mask, corr.quality,
        jnp.asarray(calib.K0, jnp.float32),
        jnp.asarray(calib.K1, jnp.float32),
        jnp.asarray(calib.dist0, jnp.float32),
        jnp.asarray(calib.dist1, jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    base_cfg = PoseConfig(robust=RobustConfig(batch_hypotheses=256, max_batches=6))
    ba_cfg = PoseConfig(
        robust=RobustConfig(batch_hypotheses=256, max_batches=6),
        ba=BAConfig(enabled=True, iterations=12),
    )
    pose0 = pipeline.estimate_pose(*args, base_cfg, key)
    pose1 = pipeline.estimate_pose(*args, ba_cfg, key)
    r0, _, _ = geo.compare_poses(
        jnp.asarray(calib.R, jnp.float32), jnp.asarray(calib.t, jnp.float32),
        pose0.R, pose0.t,
    )
    r1, t1, _ = geo.compare_poses(
        jnp.asarray(calib.R, jnp.float32), jnp.asarray(calib.t, jnp.float32),
        pose1.R, pose1.t,
    )
    assert int(pose1.n_inliers) > 100
    # BA (with restore guards) may keep the input pose but must stay accurate
    assert float(r1) < max(1.0, 1.5 * float(r0))
    assert float(t1) < 5.0


def test_run_batch_matches_single(stereo_pair, calib):
    """StereoPipeline.run_batch vmaps the full program over a pair axis and
    must agree with per-pair runs (the data-parallel unit of the pod mesh)."""
    img1, img2 = stereo_pair
    imgs1 = jnp.stack([img1, img1])
    imgs2 = jnp.stack([img2, img2])
    pipe = pipeline.StereoPipeline(
        DetectorConfig(kind="FAST", max_keypoints=1024, fast_threshold=12.0),
        DescriptorConfig(kind="ORB"),
        MatchingConfig(matcher_name="GMBSOF"),
        PoseConfig(robust=RobustConfig(batch_hypotheses=128, max_batches=4)),
    )
    K1 = jnp.asarray(calib.K0, jnp.float32)
    K2 = jnp.asarray(calib.K1, jnp.float32)
    d1 = jnp.asarray(calib.dist0, jnp.float32)
    d2 = jnp.asarray(calib.dist1, jnp.float32)
    key = jax.random.PRNGKey(3)
    corr, pose = pipe.run_batch(imgs1, imgs2, K1, K2, d1, d2, key)
    assert corr.pts1.shape[0] == 2 and pose.R.shape == (2, 3, 3)
    assert int(pose.n_inliers[0]) > 100
    # identical inputs + per-pair keys from the same split -> same count order
    rdiff, tang, _ = geo.compare_poses(
        jnp.asarray(calib.R, jnp.float32), jnp.asarray(calib.t, jnp.float32),
        pose.R[0], pose.t[0],
    )
    assert float(rdiff) < 1.0 and float(tang) < 5.0
