"""CLI apps drive the same paths as the reference executables (A1-A3).

Each app runs in-process (main(argv)) on tiny inputs: one real stereo
pair for the image CLIs, synthetic GT frames for the noMatch CLI."""

import csv
import json
import pathlib
import shutil

import numpy as np
import pytest

from tests.conftest import random_pose

STEREO_DIR = pathlib.Path(
    "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
)

needs_data = pytest.mark.skipif(
    not STEREO_DIR.exists(), reason="reference stereo data not present"
)


@pytest.fixture()
def one_pair_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for name in (
        "left_0000000000.png", "right_0000000000.png", "calib_cam_to_cam.txt"
    ):
        shutil.copy(STEREO_DIR / name, d / name)
    return d


@needs_data
def test_matchinglib_test_cli(one_pair_dir, capsys):
    from matchinglib_poselib_tpu.apps import matchinglib_test

    rc = matchinglib_test.main(
        [
            "--img_path", str(one_pair_dir),
            "--f_detect", "FAST", "--d_extr", "ORB", "--matcher", "GMBSOF",
            "--f_nr", "1024",
            "--output_path", str(one_pair_dir / "out"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["pairs"] == 1
    assert summary["total_matches"] > 100
    stored = np.load(one_pair_dir / "out" / "matches_0000.npz")
    assert len(stored["pts1"]) == summary["total_matches"]


@needs_data
def test_poselib_test_cli(one_pair_dir, capsys):
    from matchinglib_poselib_tpu.apps import poselib_test

    rc = poselib_test.main(
        [
            "--img_path", str(one_pair_dir),
            "--f_nr", "1024",
            "--compInitPose",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["frames"] == 1
    # parity band: sub-degree rotation agreement with the calibration
    assert summary["R_diff_deg_median"] < 1.5
    assert summary["t_angDiff_deg_median"] < 6.0


def _write_gt_frames(d, n_frames=3, n=300, noise=0.0008, seed=5):
    rng = np.random.default_rng(seed)
    R, t = random_pose(rng, max_angle_deg=8.0)
    K = np.array([[800.0, 0, 320.0], [0, 800.0, 240.0], [0, 0, 1.0]])
    for i in range(n_frames):
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
             rng.uniform(4, 12, n)], axis=1,
        )
        x1 = X[:, :2] / X[:, 2:]
        X2 = X @ R.T + t
        x2 = X2[:, :2] / X2[:, 2:] + rng.normal(scale=noise, size=(n, 2))
        # 15% outliers
        n_out = n // 7
        x2[:n_out] = rng.uniform(-0.4, 0.4, (n_out, 2))
        inl = np.ones(n, bool)
        inl[:n_out] = False
        p1 = x1 @ K[:2, :2].T + K[:2, 2]
        p2 = x2 @ K[:2, :2].T + K[:2, 2]
        np.savez(
            d / f"frame_{i:04d}.npz",
            pts1=p1, pts2=p2, R_GT=R, t_GT=t, K1=K, K2=K,
            inlier_mask_GT=inl,
        )
    return R, t


def test_nomatch_poselib_test_cli(tmp_path, capsys):
    from matchinglib_poselib_tpu.apps import nomatch_poselib_test

    seq = tmp_path / "sequ"
    seq.mkdir()
    _write_gt_frames(seq)
    out = tmp_path / "out"
    rc = nomatch_poselib_test.main(
        [
            "--sequ_path", str(seq),
            "--output_path", str(out),
            "--RobMethod", "RANSAC",
        ]
    )
    assert rc == 0
    rows = list(csv.DictReader(open(out / "results.csv"), delimiter=";"))
    assert len(rows) == 3
    for row in rows:
        assert float(row["R_diffAll"]) < 1.0
        assert float(row["t_angDiff_deg"]) < 5.0
        assert float(row["inlRat_GT"]) == pytest.approx(1 - (300 // 7) / 300,
                                                        abs=0.01)
        assert float(row["robEstimationAndRef_ms"]) > 0


def test_nomatch_stereoref_mode(tmp_path, capsys):
    from matchinglib_poselib_tpu.apps import nomatch_poselib_test

    seq = tmp_path / "sequ"
    seq.mkdir()
    _write_gt_frames(seq, n_frames=4)
    out = tmp_path / "out"
    rc = nomatch_poselib_test.main(
        [
            "--sequ_path", str(seq),
            "--output_path", str(out),
            "--stereoRef",
        ]
    )
    assert rc == 0
    rows = list(csv.DictReader(open(out / "results.csv"), delimiter=";"))
    assert len(rows) == 4
    # streaming mode reports state + pool size and improves over frames
    assert rows[0]["state"] in ("init", "robust")
    assert int(rows[-1]["poolSize"]) > 0
    assert float(rows[-1]["R_diffAll"]) < 1.0
