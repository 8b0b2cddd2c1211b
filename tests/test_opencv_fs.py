"""OpenCV FileStorage reader/writer (utils/opencv_fs.py).

Parity target: noMatch_poselib-test/loadMatches.h:41-110 readMatchesFromDisk
+ :223 readCamParsFromDisk (cv::FileStorage yaml/yml/xml with optional gzip).
Cross-validated against cv2.FileStorage where OpenCV is available.
"""

import csv
import gzip
import pathlib

import numpy as np
import pytest

from matchinglib_poselib_tpu.utils import opencv_fs as ofs
from conftest import random_pose


def _cam_pars(rng):
    R, t = random_pose(rng)
    K = np.array([[700.0, 0, 320.0], [0, 700.0, 240.0], [0, 0, 1.0]])
    return R, t, K


@pytest.mark.parametrize("ext", ["yaml", "yaml.gz"])
def test_cam_pars_roundtrip(tmp_path, rng, ext):
    R, t, K = _cam_pars(rng)
    p = tmp_path / f"sequSingleFrameData_0.{ext}"
    ofs.write_cam_pars(p, 5, R, t, K, K, K * 1.01, K * 0.99)
    cp = ofs.read_cam_pars(p)
    assert cp["actFrameCnt"] == 5
    np.testing.assert_allclose(cp["actR"], R, atol=1e-12)
    np.testing.assert_allclose(cp["actT"], t, atol=1e-12)
    np.testing.assert_allclose(cp["actKd1"], K * 1.01, atol=1e-9)


def test_cam_pars_cv2_cross_read(tmp_path, rng):
    """Our yaml must be readable by cv::FileStorage itself."""
    cv2 = pytest.importorskip("cv2")
    R, t, K = _cam_pars(rng)
    p = tmp_path / "cp.yaml"
    ofs.write_cam_pars(p, 3, R, t, K, K, K, K)
    fs = cv2.FileStorage(str(p), cv2.FILE_STORAGE_READ)
    assert fs.isOpened()
    np.testing.assert_allclose(fs.getNode("actR").mat(), R, atol=1e-12)
    assert int(fs.getNode("actFrameCnt").real()) == 3
    fs.release()


def test_cv2_written_yaml_and_xml_read(tmp_path, rng):
    """cv::FileStorage-written files must be readable by our parser."""
    cv2 = pytest.importorskip("cv2")
    R, t, K = _cam_pars(rng)
    for name in ["cp.yaml", "cp.xml"]:
        p = tmp_path / name
        fs = cv2.FileStorage(str(p), cv2.FILE_STORAGE_WRITE)
        fs.write("actFrameCnt", 7)
        fs.write("actR", R)
        fs.write("actT", t.reshape(3, 1))
        for k in ["K1", "K2", "actKd1", "actKd2"]:
            fs.write(k, K)
        fs.release()
        cp = ofs.read_cam_pars(p)
        assert cp["actFrameCnt"] == 7
        np.testing.assert_allclose(cp["actR"], R, atol=1e-12)
        np.testing.assert_allclose(cp["actT"], t, atol=1e-12)


def test_legacy_yaml10_directive(tmp_path):
    """OpenCV <=4.x writes the nonstandard '%YAML:1.0' directive."""
    text = (
        "%YAML:1.0\n---\nactFrameCnt: 2\n"
        "actR: !!opencv-matrix\n   rows: 3\n   cols: 3\n   dt: d\n"
        "   data: [ 1., 0., 0., 0., 1., 0., 0., 0., 1. ]\n"
    )
    p = tmp_path / "legacy.yml"
    p.write_text(text)
    d = ofs.load_filestorage(p)
    assert d["actFrameCnt"] == 2
    np.testing.assert_allclose(d["actR"], np.eye(3))


def _matches_fixture(rng, n=40, m=25):
    kp1 = np.concatenate(
        [rng.uniform(0, 600, (n, 2)), np.full((n, 1), 31.0),
         np.full((n, 1), -1.0), rng.uniform(0, 1, (n, 1)),
         np.zeros((n, 1)), np.full((n, 1), -1.0)], axis=1,
    ).astype(np.float32)
    kp2 = kp1 + rng.normal(0, 1, kp1.shape).astype(np.float32)
    d1 = rng.integers(0, 256, (n, 32)).astype(np.uint8)
    d2 = rng.integers(0, 256, (n, 32)).astype(np.uint8)
    mt = np.stack(
        [np.arange(m), rng.permutation(n)[:m], np.zeros(m),
         np.sort(rng.uniform(0, 100, m))], axis=1,
    ).astype(np.float32)
    inl = rng.integers(0, 2, m).astype(bool)
    return kp1, kp2, d1, d2, mt, inl


def test_matches_roundtrip_gz(tmp_path, rng):
    kp1, kp2, d1, d2, mt, inl = _matches_fixture(rng)
    H = [np.eye(3), np.asarray(rng.normal(size=(3, 3)))]
    p = tmp_path / "matchSingleFrameData_0.yaml.gz"
    ofs.write_matches(p, kp1, kp2, d1, d2, mt, inl, homographies=H,
                      corr_type=np.zeros(len(mt), np.int32))
    assert p.read_bytes()[:2] == b"\x1f\x8b"  # actually gzipped
    sm = ofs.read_matches(p)
    np.testing.assert_allclose(sm["frameKeypoints1"], kp1, atol=1e-4)
    assert (sm["frameDescriptors1"] == d1).all()
    np.testing.assert_allclose(sm["frameMatches"], mt, atol=1e-3)
    assert (sm["frameInliers"] == inl).all()
    np.testing.assert_allclose(sm["frameHomographies"][1], H[1], atol=1e-9)


def test_sequ_frame_assembly(rng):
    kp1, kp2, d1, d2, mt, inl = _matches_fixture(rng)
    R, t, K = _cam_pars(rng)
    cp = dict(actFrameCnt=0, actR=R, actT=t, K1=K, K2=K, actKd1=K, actKd2=K)
    sm = dict(frameKeypoints1=kp1, frameKeypoints2=kp2, frameMatches=mt,
              frameInliers=inl)
    fr = ofs.sequ_frame(cp, sm)
    q = mt[:, 0].astype(int)
    tr = mt[:, 1].astype(int)
    np.testing.assert_allclose(fr["pts1"], kp1[q, :2], atol=1e-5)
    np.testing.assert_allclose(fr["pts2"], kp2[tr, :2], atol=1e-5)
    assert fr["inlier_mask_GT"].shape == (len(mt),)


def _write_fs_sequence(d, n_frames=2, n=300, seed=5):
    """Synthetic GT sequence in the reference's FileStorage layout."""
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
        x2 = X2[:, :2] / X2[:, 2:] + rng.normal(scale=8e-4, size=(n, 2))
        n_out = n // 7
        x2[:n_out] = rng.uniform(-0.4, 0.4, (n_out, 2))
        inl = np.ones(n, bool)
        inl[:n_out] = False
        p1 = x1 @ K[:2, :2].T + K[:2, 2]
        p2 = x2 @ K[:2, :2].T + K[:2, 2]

        def kps(p):
            nn = len(p)
            return np.concatenate(
                [p, np.full((nn, 1), 31.0), np.full((nn, 1), -1.0),
                 np.zeros((nn, 1)), np.zeros((nn, 1)),
                 np.full((nn, 1), -1.0)], axis=1,
            ).astype(np.float32)

        perm = rng.permutation(n)  # kp2 shuffled (loadMatches.h:44-48)
        mt = np.stack(
            [np.arange(n), np.argsort(perm), np.zeros(n),
             np.arange(n, dtype=float)], axis=1,
        ).astype(np.float32)
        desc = rng.integers(0, 256, (n, 32)).astype(np.uint8)
        ofs.write_cam_pars(d / f"sequSingleFrameData_{i}.yaml.gz",
                           i, R, t, K, K, K, K)
        ofs.write_matches(d / f"matchSingleFrameData_{i}.yaml.gz",
                          kps(p1), kps(p2[perm]), desc, desc[perm], mt, inl)
    return R, t


@pytest.mark.slow
def test_nomatch_cli_reads_filestorage_sequence(tmp_path):
    """End-to-end: the GT CLI consumes the reference's FileStorage layout."""
    from matchinglib_poselib_tpu.apps import nomatch_poselib_test

    seq = tmp_path / "sequ"
    seq.mkdir()
    _write_fs_sequence(seq)
    out = tmp_path / "out"
    rc = nomatch_poselib_test.main([
        "--sequ_path", str(seq),
        "--output_path", str(out),
        "--ovf_ext", "yaml.gz",
        "--RobMethod", "RANSAC",
        "--no_warmup",
    ])
    assert rc == 0
    rows = list(csv.DictReader(open(out / "results.csv"), delimiter=";"))
    assert len(rows) == 2
    for row in rows:
        assert float(row["R_diffAll"]) < 1.0
        assert float(row["t_angDiff_deg"]) < 5.0
        # per-axis columns consistent with R_diffAll (57.3x unit-bug guard)
        axes = np.array([float(row["R_diff_roll"]),
                         float(row["R_diff_pitch"]),
                         float(row["R_diff_yaw"])])
        assert np.linalg.norm(axes) < 2.0 * float(row["R_diffAll"]) + 0.1


def test_committed_fixture_sequence_loads():
    """The committed FileStorage fixture must parse (round-trips on disk)."""
    fix = pathlib.Path(__file__).resolve().parents[1] / (
        "eval/fixtures/semireal_fs"
    )
    if not fix.exists():
        pytest.skip("fixture not committed yet")
    cams = sorted(fix.glob("sequSingleFrameData_*.yaml.gz"))
    assert cams, "no cam-par files in committed fixture"
    for c in cams:
        cp = ofs.read_cam_pars(c)
        assert cp["actR"].shape == (3, 3)
    ms = sorted(fix.glob("matchSingleFrameData_*.yaml.gz"))
    assert ms
    sm = ofs.read_matches(ms[0])
    assert sm["frameMatches"].shape[1] == 4
