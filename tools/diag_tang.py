"""Diagnose the t_ang gap (VERDICT r2 item 1): cross matcher x estimator.

Runs 4 stacks on the bundled KITTI stereo pairs against the calibration
extrinsics:
  A  OpenCV matches + OpenCV estimator (FAIR: points pre-undistorted)
  B  OpenCV matches + our estimator
  C  our GMBSOF matches + OpenCV estimator
  D  our matches + our estimator (current parity config)
plus config sweeps of our estimator on OpenCV matches.
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.parity_accuracy import (  # noqa: E402
    STEREO, N_KPTS, RATIO, TH_PX, rot_angle_deg, t_angle_deg,
)


def undistorted_opencv_matches(pairs, K1, K2, d1, d2):
    """FAST+ORB+BF ratio matches, undistorted to normalized camera coords."""
    import cv2

    from tools.baseline_cpu import grid_cap

    detector = cv2.FastFeatureDetector_create(threshold=12)
    orb = cv2.ORB_create(nfeatures=N_KPTS)
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    out = []
    for img1, img2 in pairs:
        kp1 = grid_cap(detector.detect(img1, None), N_KPTS, img1.shape)
        kp2 = grid_cap(detector.detect(img2, None), N_KPTS, img2.shape)
        kp1, de1 = orb.compute(img1, kp1)
        kp2, de2 = orb.compute(img2, kp2)
        knn = matcher.knnMatch(de1, de2, k=2)
        good = [m for m, n in (p for p in knn if len(p) == 2)
                if m.distance < RATIO * n.distance]
        p1 = np.float64([kp1[m.queryIdx].pt for m in good])
        p2 = np.float64([kp2[m.trainIdx].pt for m in good])
        x1 = cv2.undistortPoints(p1.reshape(-1, 1, 2), K1, d1).reshape(-1, 2)
        x2 = cv2.undistortPoints(p2.reshape(-1, 1, 2), K2, d2).reshape(-1, 2)
        out.append((p1, p2, x1, x2))
    return out


def cv_estimate(x1, x2, th_norm):
    """OpenCV USAC on normalized coords (K=I)."""
    import cv2

    E, inl = cv2.findEssentialMat(
        x1, x2, np.eye(3), method=cv2.USAC_DEFAULT, prob=0.999,
        threshold=th_norm,
    )
    if E is None or E.shape[0] < 3:
        return None, None
    _, R, t, _ = cv2.recoverPose(E[:3], x1, x2, np.eye(3), inl.copy())
    return R, t


_PAD = 2048


def ours_estimate(x1, x2, th_norm, cfg, key):
    """Our robust engine on pre-normalized coords (K=I, no distortion).

    Pads to a fixed slot count so every frame reuses ONE compiled
    program (per-frame shapes would recompile estimate_pose ~200x).
    """
    import jax
    import jax.numpy as jnp

    from matchinglib_poselib_tpu.models import pipeline

    K = min(len(x1), _PAD)
    x1p = np.zeros((_PAD, 2), np.float32)
    x2p = np.zeros((_PAD, 2), np.float32)
    x1p[:K] = x1[:K]
    x2p[:K] = x2[:K]
    mask = np.zeros(_PAD, np.float32)
    mask[:K] = 1.0
    eye = jnp.eye(3, dtype=jnp.float32)
    z5 = jnp.zeros(5, jnp.float32)
    res = pipeline.estimate_pose(
        jnp.asarray(x1p), jnp.asarray(x2p),
        jnp.asarray(mask), jnp.asarray(mask),
        eye, eye, z5, z5, cfg, key,
    )
    return np.asarray(res.R, np.float64), np.asarray(res.t, np.float64)


def agg(name, rows):
    r = np.asarray([x[0] for x in rows if x[0] is not None])
    t = np.asarray([x[1] for x in rows if x[1] is not None])
    print(f"{name:36s} R {np.mean(r):6.3f}/{np.median(r):6.3f}  "
          f"t {np.mean(t):6.3f}/{np.median(t):6.3f}  n={len(r)}")
    return np.mean(t), np.median(t)


def main():
    import cv2
    import jax

    from matchinglib_poselib_tpu.config import (
        PoseConfig, RefinementConfig, RobustConfig, BAConfig,
    )
    from matchinglib_poselib_tpu.utils import io as tio

    calib = tio.load_kitti_calib(STEREO / "calib_cam_to_cam.txt")
    R_gt = np.asarray(calib.R, np.float64)
    t_gt = np.asarray(calib.t, np.float64)
    K1 = np.asarray(calib.K0, np.float64)
    K2 = np.asarray(calib.K1, np.float64)
    d1 = np.asarray(calib.dist0, np.float64)
    d2 = np.asarray(calib.dist1, np.float64)
    f_mean = 0.25 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1])
    th_norm = TH_PX / f_mean

    lefts = sorted(STEREO.glob("left_*.png"))
    rights = sorted(STEREO.glob("right_*.png"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(lefts)
    pairs = [
        (cv2.imread(str(a), cv2.IMREAD_GRAYSCALE),
         cv2.imread(str(b), cv2.IMREAD_GRAYSCALE))
        for a, b in zip(lefts[:n], rights[:n])
    ]
    matches = undistorted_opencv_matches(pairs, K1, K2, d1, d2)

    # A: fair OpenCV baseline
    rows = []
    for p1, p2, x1, x2 in matches:
        R, t = cv_estimate(x1, x2, th_norm)
        rows.append((rot_angle_deg(R, R_gt), t_angle_deg(t, t_gt))
                    if R is not None else (None, None))
    agg("A: cv matches + cv USAC (fair)", rows)

    # B variants: our estimator on the same matches. Points are already in
    # normalized camera coords (K=I inside estimate_pose -> f_mean=1), so
    # threshold_px must carry the normalized threshold directly.
    base = RobustConfig(batch_hypotheses=256, max_batches=4,
                        threshold_px=th_norm)
    big = RobustConfig(batch_hypotheses=512, max_batches=8,
                       threshold_px=th_norm)
    variants = {
        "B0: parity cfg (256x4,refine)": PoseConfig(robust=base),
        "B1: 512x8": PoseConfig(robust=big),
        "B2: no refine": PoseConfig(
            robust=base, refine=RefinementConfig(enabled=False)),
        "B3: +BA": PoseConfig(robust=base, ba=BAConfig(enabled=True)),
        "B4: 512x8+BA": PoseConfig(robust=big, ba=BAConfig(enabled=True)),
    }
    for name, cfg in variants.items():
        rows = []
        for i, (p1, p2, x1, x2) in enumerate(matches):
            R, t = ours_estimate(x1, x2, th_norm, cfg, jax.random.PRNGKey(i))
            rows.append((rot_angle_deg(R, R_gt), t_angle_deg(t, t_gt)))
        agg(name, rows)


if __name__ == "__main__":
    main()
