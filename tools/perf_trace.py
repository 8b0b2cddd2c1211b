"""Op-level trace profile of the fused pipeline step on the real chip.

Captures a jax.profiler trace of N fused steps, parses the xspace with
jax.profiler.ProfileData, and aggregates device-op durations by fusion
name — the ground truth that drives the perf work (SCALING.md).

Run ON TPU: python tools/perf_trace.py
"""

from __future__ import annotations

import collections
import glob
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/jax_trace_fused"
N_STEPS = 20


def main():
    from matchinglib_poselib_tpu.config import (
        DescriptorConfig,
        DetectorConfig,
        MatchingConfig,
        PoseConfig,
        RobustConfig,
    )
    from matchinglib_poselib_tpu.models import pipeline
    from matchinglib_poselib_tpu.utils import io

    stereo = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
    )
    i1 = jnp.asarray(io.load_image_gray(stereo / "left_0000000000.png"))
    i2 = jnp.asarray(io.load_image_gray(stereo / "right_0000000000.png"))
    calib = io.load_kitti_calib(stereo / "calib_cam_to_cam.txt")
    K1 = jnp.asarray(calib.K0, jnp.float32)
    K2 = jnp.asarray(calib.K1, jnp.float32)
    d1 = jnp.asarray(calib.dist0, jnp.float32)
    d2 = jnp.asarray(calib.dist1, jnp.float32)
    det = DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0)
    desc = DescriptorConfig(kind="ORB")
    match = MatchingConfig(matcher_name="GMBSOF")
    pose_cfg = PoseConfig(robust=RobustConfig(batch_hypotheses=96,
                                              max_batches=12))
    key = jax.random.PRNGKey(0)

    def step(a, b):
        c = pipeline.get_correspondences(a, b, det, desc, match)
        r = pipeline.estimate_pose(
            c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2, pose_cfg, key
        )
        return r.R, r.t, r.n_inliers

    stepj = jax.jit(step)
    for _ in range(3):
        out = stepj(i1, i2)
    jax.block_until_ready(out)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(N_STEPS):
            out = stepj(i1, i2)
        jax.block_until_ready(out)

    # parse: find the xplane file and aggregate TPU-op durations
    files = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    assert files, "no xplane written"
    data = jax.profiler.ProfileData.from_serialized_xspace(
        pathlib.Path(files[-1]).read_bytes()
    )
    per_op = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e3 / N_STEPS  # us per step
                per_op[ev.name] += dur
                cnt[ev.name] += 1
                total += dur
    print(
        f"total device-op time per step: {total:.0f} us; "
        f"events/step: {sum(cnt.values()) // N_STEPS}"
    )
    for name, us in per_op.most_common(45):
        print(f"{us:9.1f} us  n={cnt[name] // N_STEPS:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
