"""Perf bisection on the real chip: where do the fused step's ms go?

Times jitted variants of the pipeline with individual stages/knobs
toggled, on the bundled KITTI pair — measured attribution to drive the
round-4 optimization work (VERDICT #2: close 141 fps -> >=179 fps).

Run ON TPU (no env overrides): python tools/perf_bisect.py
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _time(fn, n_iter=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


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
    rob = RobustConfig(batch_hypotheses=96, max_batches=12)
    pose_cfg = PoseConfig(robust=rob)
    key = jax.random.PRNGKey(0)

    corrj = jax.jit(
        lambda a, b: pipeline.get_correspondences(a, b, det, desc, match)
    )
    corr = jax.block_until_ready(corrj(i1, i2))

    rows = []

    def add(name, fn):
        dt = _time(fn)
        rows.append((name, 1e3 * dt))
        print(f"{name:55s} {1e3 * dt:7.3f} ms", flush=True)

    # --- correspondences variants (default: GMBSOF, subpix off) ---
    add("corr: bench default (GMBSOF)", lambda: corrj(i1, i2))
    for mname, sub, tag in [
        ("GMBSOF", True, "corr: GMBSOF + subpix"),
        ("LINEAR", False, "corr: plain 2NN"),
    ]:
        m2 = dataclasses.replace(match, matcher_name=mname, subpix_refine=sub)
        cj = jax.jit(
            lambda a, b, m2=m2: pipeline.get_correspondences(
                a, b, det, desc, m2
            )
        )
        add(tag, lambda cj=cj: cj(i1, i2))

    # --- pose variants ---
    def mkpose(cfg):
        pj = jax.jit(
            lambda c, k: pipeline.estimate_pose(
                c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2, cfg, k
            )
        )
        return lambda: pj(corr, key)

    add("pose: full (robust+IRLS+polish+BA-off)", mkpose(pose_cfg))
    add(
        "pose: no polish",
        mkpose(
            dataclasses.replace(
                pose_cfg,
                refine=dataclasses.replace(pose_cfg.refine, polish_rt=False),
            )
        ),
    )
    add(
        "pose: no IRLS refine",
        mkpose(
            dataclasses.replace(
                pose_cfg,
                refine=dataclasses.replace(pose_cfg.refine, enabled=False),
            )
        ),
    )
    add(
        "pose: robust only",
        mkpose(
            dataclasses.replace(
                pose_cfg,
                refine=dataclasses.replace(
                    pose_cfg.refine, enabled=False, polish_rt=False
                ),
            )
        ),
    )
    for bh, mb in [(96, 12), (192, 6), (256, 4), (384, 3), (512, 2)]:
        add(
            f"pose: full, hyp {bh}x{mb}",
            mkpose(
                dataclasses.replace(
                    pose_cfg,
                    robust=dataclasses.replace(
                        rob, batch_hypotheses=bh, max_batches=mb
                    ),
                )
            ),
        )
    for rounds, iters in [(3, 8), (2, 8), (2, 6), (1, 8)]:
        add(
            f"pose: full, polish {rounds}r x {iters}it",
            mkpose(
                dataclasses.replace(
                    pose_cfg,
                    refine=dataclasses.replace(
                        pose_cfg.refine,
                        polish_rounds=rounds,
                        polish_iterations=iters,
                    ),
                )
            ),
        )
    for it in (8, 6, 4):
        add(
            f"pose: full, IRLS {it}it",
            mkpose(
                dataclasses.replace(
                    pose_cfg,
                    refine=dataclasses.replace(
                        pose_cfg.refine, iterations=it
                    ),
                )
            ),
        )

    # --- fused step ---
    def step(a, b, fi):
        k = jax.random.fold_in(key, fi)
        c = pipeline.get_correspondences(a, b, det, desc, match)
        r = pipeline.estimate_pose(
            c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2, pose_cfg, k
        )
        return r.R, r.t, r.n_inliers

    stepj = jax.jit(step, static_argnums=(2,))
    add("fused step (headline)", lambda: stepj(i1, i2, 0))

    print("\nsummary:")
    for n, ms in rows:
        print(f"  {n:55s} {ms:7.3f}")


if __name__ == "__main__":
    main()
