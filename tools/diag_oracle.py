"""Oracle experiment: what t_ang can an ideal final polish achieve?

On undistorted OpenCV matches: (a) 8pt LS on GT inliers, (b) scipy
Gauss-Newton minimizing Sampson over (R,t) from GT init, (c) same from
cv RANSAC init, (d) our refine_essential_linear from cv RANSAC init.
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.parity_accuracy import STEREO, TH_PX, rot_angle_deg, t_angle_deg
from tools.diag_tang import undistorted_opencv_matches, cv_estimate


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def sampson(E, x1, x2):
    h1 = np.concatenate([x1, np.ones((len(x1), 1))], 1)
    h2 = np.concatenate([x2, np.ones((len(x2), 1))], 1)
    Ex1 = h1 @ E.T
    Etx2 = h2 @ E
    num = np.sum(h2 * Ex1, 1)
    den = Ex1[:, 0]**2 + Ex1[:, 1]**2 + Etx2[:, 0]**2 + Etx2[:, 1]**2
    return num / np.sqrt(den)


def rt_to_E(rvec, sph):
    R = Rotation.from_rotvec(rvec).as_matrix()
    th, ph = sph
    t = np.array([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                  np.cos(th)])
    return skew(t) @ R, R, t


def polish_rt(R0, t0, x1, x2, inl):
    rv0 = Rotation.from_matrix(R0).as_rotvec()
    t0 = t0.ravel() / np.linalg.norm(t0)
    th0 = np.arccos(np.clip(t0[2], -1, 1))
    ph0 = np.arctan2(t0[1], t0[0])
    p0 = np.concatenate([rv0, [th0, ph0]])

    xi1, xi2 = x1[inl], x2[inl]

    def resid(p):
        E, _, _ = rt_to_E(p[:3], p[3:])
        return sampson(E, xi1, xi2)

    sol = least_squares(resid, p0, method="lm", max_nfev=200)
    E, R, t = rt_to_E(sol.x[:3], sol.x[3:])
    return R, t


def main():
    import cv2

    from matchinglib_poselib_tpu.utils import io as tio

    calib = tio.load_kitti_calib(STEREO / "calib_cam_to_cam.txt")
    R_gt = np.asarray(calib.R, np.float64)
    t_gt = np.asarray(calib.t, np.float64).ravel()
    t_gtn = t_gt / np.linalg.norm(t_gt)
    K1 = np.asarray(calib.K0, np.float64)
    K2 = np.asarray(calib.K1, np.float64)
    d1 = np.asarray(calib.dist0, np.float64)
    d2 = np.asarray(calib.dist1, np.float64)
    f_mean = 0.25 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1])
    th_norm = TH_PX / f_mean

    E_gt = skew(t_gtn) @ R_gt

    lefts = sorted(STEREO.glob("left_*.png"))
    rights = sorted(STEREO.glob("right_*.png"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    pairs = [(cv2.imread(str(a), cv2.IMREAD_GRAYSCALE),
              cv2.imread(str(b), cv2.IMREAD_GRAYSCALE))
             for a, b in zip(lefts[:n], rights[:n])]
    matches = undistorted_opencv_matches(pairs, K1, K2, d1, d2)

    res = {k: [] for k in ["gtinl", "polishGT", "polishCV", "cv"]}
    for i, (p1, p2, x1, x2) in enumerate(matches):
        gt_inl = np.abs(sampson(E_gt, x1, x2)) < th_norm
        print(f"frame {i}: {gt_inl.sum()}/{len(x1)} GT inliers, "
              f"sampson_med={np.median(np.abs(sampson(E_gt, x1, x2))):.2e} "
              f"th={th_norm:.2e}")

        # (b) polish from GT init on GT inliers
        R, t = polish_rt(R_gt, t_gtn, x1, x2, gt_inl)
        res["polishGT"].append((rot_angle_deg(R, R_gt), t_angle_deg(t, t_gt)))

        # (c) polish from cv RANSAC estimate, inliers from that model
        Rc, tc = cv_estimate(x1, x2, th_norm)
        res["cv"].append((rot_angle_deg(Rc, R_gt), t_angle_deg(tc, t_gt)))
        E_c = skew(tc.ravel()) @ Rc
        inl_c = np.abs(sampson(E_c, x1, x2)) < th_norm
        R, t = polish_rt(Rc, tc, x1, x2, inl_c)
        res["polishCV"].append((rot_angle_deg(R, R_gt),
                                t_angle_deg(t, t_gt)))

    for k, rows in res.items():
        if not rows:
            continue
        r = np.array([x[0] for x in rows])
        t = np.array([x[1] for x in rows])
        print(f"{k:10s} R {r.mean():6.3f}/{np.median(r):6.3f}  "
              f"t {t.mean():6.3f}/{np.median(t):6.3f}")


if __name__ == "__main__":
    main()
