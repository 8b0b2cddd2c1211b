"""Measure the reference-equivalent CPU pipeline to produce BASELINE_MEASURED.json.

The reference cannot be built in this image (its ci/*.sh fetch Boost/Eigen/
CLAPACK/SBA from the network, which is unavailable). But the reference's
matchinglib is to a large degree an *orchestration of OpenCV*: its detectors,
descriptors and brute-force/FLANN matchers are cv::Feature2D / cv::DescriptorMatcher
calls (matchinglib/source/matchers.cpp, features.cpp), and its poselib USAC is a
CPU RANSAC of the same family as cv::USAC_*. OpenCV (with python bindings) IS
available in this image, so we measure the same workload the reference's
poselib-test executes on its own bundled KITTI stereo pair:

    FAST detect (grid-capped 2048 kps) -> ORB describe -> 2-NN ratio match
    -> findEssentialMat(USAC_DEFAULT, 0.8 px) -> recoverPose

per stage, single- and multi-threaded, averaged over the 10 bundled frames x
repeats. The result is a *measured* frames/s denominator for bench.py's
vs_baseline — replacing the previous estimate — plus per-stage millisecond
timings mirroring the reference's stage taxonomy
(matchinglib/source/correspondences.cpp:221-240 timing prints).

Run: python tools/baseline_cpu.py  (writes BASELINE_MEASURED.json)
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

import cv2

STEREO = pathlib.Path(
    "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
)
N_KPTS = 2048
RATIO = 0.75  # Lowe ratio used by the reference (match_helpers.cpp ratio test)
TH_PX = 0.8  # reference default pixel threshold (pose_estim.h PIX_MIN_GOOD_TH)
REPEATS = 5


def load_calib():
    txt = (STEREO / "calib_cam_to_cam.txt").read_text().splitlines()
    vals = {}
    for line in txt:
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        vals[k.strip()] = np.fromstring(v, sep=" ")
    K1 = vals["K_00"].reshape(3, 3)
    K2 = vals["K_01"].reshape(3, 3)
    return K1, K2


def grid_cap(kps, n_max, shape, gx=8, gy=4):
    """Reference-style grid-capped keypoint retention (features.cpp
    responseFilterGridBased): strongest keypoints per cell, n_max total.
    Vectorized so Python overhead does not penalize the baseline."""
    if len(kps) <= n_max:
        return kps
    h, w = shape
    pts = np.array([kp.pt for kp in kps])
    resp = np.array([kp.response for kp in kps])
    cell = (pts[:, 0] * gx / w).astype(int) * gy + (
        pts[:, 1] * gy / h
    ).astype(int)
    per_cell = max(1, n_max // (gx * gy))
    # rank within cell by response: sort by (cell, -response)
    order = np.lexsort((-resp, cell))
    rank = np.empty(len(kps), int)
    cc = cell[order]
    rank[order] = np.arange(len(kps)) - np.searchsorted(cc, cc, side="left")
    keep = order[rank[order] < per_cell]
    if len(keep) > n_max:
        keep = keep[np.argsort(-resp[keep])[:n_max]]
    return [kps[i] for i in keep]


def run_pipeline(img1, img2, K1, K2, detector, orb, matcher):
    t0 = time.perf_counter()
    kp1 = grid_cap(detector.detect(img1, None), N_KPTS, img1.shape)
    kp2 = grid_cap(detector.detect(img2, None), N_KPTS, img2.shape)
    t1 = time.perf_counter()
    kp1, d1 = orb.compute(img1, kp1)
    kp2, d2 = orb.compute(img2, kp2)
    t2 = time.perf_counter()
    knn = matcher.knnMatch(d1, d2, k=2)
    good = [m for m, n in (p for p in knn if len(p) == 2)
            if m.distance < RATIO * n.distance]
    t3 = time.perf_counter()
    if len(good) >= 5:
        p1 = np.float64([kp1[m.queryIdx].pt for m in good])
        p2 = np.float64([kp2[m.trainIdx].pt for m in good])
        E, inl = cv2.findEssentialMat(
            p1, p2, cameraMatrix1=K1, cameraMatrix2=K2,
            distCoeffs1=None, distCoeffs2=None,
            method=cv2.USAC_DEFAULT, prob=0.999, threshold=TH_PX,
        )
        if E is not None and E.shape[0] >= 3:
            cv2.recoverPose(E[:3], p1, p2, K1, inl)
    t4 = time.perf_counter()
    return {
        "detect_ms": (t1 - t0) * 1e3,
        "describe_ms": (t2 - t1) * 1e3,
        "match_ms": (t3 - t2) * 1e3,
        "pose_ms": (t4 - t3) * 1e3,
        "total_ms": (t4 - t0) * 1e3,
        "n_matches": len(good),
    }


def measure(n_threads):
    cv2.setNumThreads(n_threads)
    K1, K2 = load_calib()
    lefts = sorted(STEREO.glob("left_*.png"))
    rights = sorted(STEREO.glob("right_*.png"))
    pairs = [
        (cv2.imread(str(a), cv2.IMREAD_GRAYSCALE),
         cv2.imread(str(b), cv2.IMREAD_GRAYSCALE))
        for a, b in zip(lefts, rights)
    ]
    detector = cv2.FastFeatureDetector_create(threshold=12)
    orb = cv2.ORB_create(nfeatures=N_KPTS)
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)

    # warmup
    run_pipeline(*pairs[0], K1, K2, detector, orb, matcher)

    rows = []
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        for img1, img2 in pairs:
            rows.append(run_pipeline(img1, img2, K1, K2, detector, orb, matcher))
    wall = time.perf_counter() - t0
    n = len(rows)
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    agg["frames_per_s"] = n / wall
    agg["n_frames_timed"] = n
    agg["n_threads"] = n_threads
    return agg


def main():
    out = {
        "workload": (
            "FAST(th=12, grid-capped 2048) + ORB + BF 2NN ratio 0.75 + "
            "findEssentialMat(USAC_DEFAULT, 0.8px) + recoverPose on the "
            "reference's bundled KITTI stereo frames (1392x512)"
        ),
        "opencv_version": cv2.__version__,
        "note": (
            "reference binaries cannot be built offline (ci/*.sh network "
            "fetches); this measures the identical OpenCV workload the "
            "reference's matchinglib dispatches to (matchers.cpp/features.cpp) "
            "plus cv2 USAC in place of its own USAC implementation"
        ),
        "single_thread": measure(1),
        "multi_thread": measure(0),  # 0 = let OpenCV use all cores
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
