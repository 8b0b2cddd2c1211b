"""ROS interface adapter (apps/ros_interface.py, A5 parity)."""

import numpy as np

from matchinglib_poselib_tpu.apps import ros_interface as ri
from matchinglib_poselib_tpu.config import PoseEstimator


def test_params_to_configs_mapping():
    cfg = ri.params_to_configs({
        "f_detect": "FAST",
        "d_extr": "ORB",
        "matcher": "GMBSOF",
        "nrFeatures": 512,
        "subPixRef": "1",
        "th": 1.2,
        "RobMethod": "RANSAC",
        "refineRT": "00",
        "BART": "1",
        "stereoRef": "0",
    })
    assert cfg["det"].max_keypoints == 512
    assert cfg["match"].subpix_refine is True
    assert cfg["pose"].robust.estimator is PoseEstimator.RANSAC
    assert abs(cfg["pose"].robust.threshold_px - 1.2) < 1e-9
    assert cfg["pose"].refine.enabled is False  # refineRT 00
    assert cfg["pose"].ba.enabled is True


def test_params_unknown_rejected():
    import pytest

    with pytest.raises(KeyError):
        ri.params_to_configs({"definitely_not_a_param": 1})


def test_node_stream_and_reconfigure(rng):
    """Frames through the callback; reconfigure rebuilds static configs."""
    poses = []
    node = ri.MatchingPoselibNode(
        params={"nrFeatures": 256, "matcher": "LINEAR"},
        on_pose=poses.append,
    )
    K = np.array([[240.0, 0, 160.0], [0, 240.0, 120.0], [0, 0, 1.0]])
    node.set_calibration(K, K, np.zeros(5), np.zeros(5))

    # textured image pair with a small horizontal shift
    base = rng.random((240, 320)).astype(np.float32)
    from scipy.ndimage import gaussian_filter, shift

    img = gaussian_filter(base, 1.2)
    img2 = shift(img, (0.0, -4.0), order=1, mode="nearest")
    msg = node.handle_stereo_pair(img, img2)
    assert msg.R.shape == (3, 3)
    assert np.isfinite(msg.R).all() and np.isfinite(msg.t).all()
    assert poses and poses[0] is msg

    node.reconfigure({"nrFeatures": 128})
    assert node._det.max_keypoints == 128
    # unchanged delta is a no-op (no rebuild)
    det_before = node._det
    node.reconfigure({"nrFeatures": 128})
    assert node._det is det_before
