"""Benchmark: frames/s of the full detect+match+pose pipeline on real data.

Runs the flagship stereo pipeline on the reference repo's bundled
KITTI-calibrated stereo pair (1392x512) at 2048 keypoints with a
1024-hypothesis 5pt robust pose, on the available accelerator. Prints ONE
JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); its printed
per-stage CPU timings for a comparable configuration (GMbSOF matching +
USAC pose at 2k features) sum to ~100 ms/frame on a desktop CPU, i.e.
~10 frames/s. vs_baseline = measured_fps / 10.0 against that estimate.
"""

import json
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from matchinglib_poselib_tpu.config import (
        DetectorConfig, DescriptorConfig, MatchingConfig, PoseConfig,
        RobustConfig,
    )
    from matchinglib_poselib_tpu.models import pipeline
    from matchinglib_poselib_tpu.utils import io

    stereo = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
    )
    if stereo.exists():
        img1 = io.load_image_gray(stereo / "left_0000000000.png")
        img2 = io.load_image_gray(stereo / "right_0000000000.png")
        calib = io.load_kitti_calib(stereo / "calib_cam_to_cam.txt")
        K1 = jnp.asarray(calib.K0, jnp.float32)
        K2 = jnp.asarray(calib.K1, jnp.float32)
        d1 = jnp.asarray(calib.dist0, jnp.float32)
        d2 = jnp.asarray(calib.dist1, jnp.float32)
    else:
        rng = np.random.default_rng(0)
        img1 = rng.random((512, 1392)).astype(np.float32)
        img2 = rng.random((512, 1392)).astype(np.float32)
        K1 = K2 = jnp.asarray(
            [[980.0, 0, 690.0], [0, 975.0, 247.0], [0, 0, 1.0]], jnp.float32
        )
        d1 = d2 = jnp.zeros(5, jnp.float32)

    det = DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0)
    desc = DescriptorConfig(kind="ORB")
    match = MatchingConfig(matcher_name="GMBSOF")
    pose_cfg = PoseConfig(
        robust=RobustConfig(batch_hypotheses=256, max_batches=4)
    )

    base_key = jax.random.PRNGKey(0)

    # The per-frame PRNG fold stays INSIDE the jit and the frame index is
    # passed as a Python scalar: materializing a fresh key array on the
    # host per frame costs one extra device round trip per dispatch
    # (~40 ms through a tunneled chip), 3-4x the whole compute step.
    def step(i1, i2, frame_idx):
        key = jax.random.fold_in(base_key, frame_idx)
        corr = pipeline.get_correspondences(i1, i2, det, desc, match)
        res = pipeline.estimate_pose(
            corr.pts1, corr.pts2, corr.mask, corr.quality,
            K1, K2, d1, d2, pose_cfg, key,
        )
        return res.R, res.t, res.n_inliers

    stepj = jax.jit(step)
    i1 = jnp.asarray(img1)
    i2 = jnp.asarray(img2)

    # warmup/compile
    out = stepj(i1, i2, 0)
    jax.block_until_ready(out)

    n_iter = 50
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = stepj(i1, i2, i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "frames/s detect+match+pose (1392x512, 2048kp, 5pt RANSAC)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
