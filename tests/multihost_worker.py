"""Worker for the 2-process multi-host test (run by test_multihost.py).

Each process owns 4 virtual CPU devices; the ("pairs", "db") mesh spans
both processes with the `pairs` axis crossing the process (DCN-style)
boundary. Exercises, with exact content assertions:

- pod-wide kNN (parallel.matching.sharded_match) on a db sharded across
  the processes, queries planted as db rows;
- frame-window sharding + windowed pose consensus (parallel.stream);
- distributed point-sharded BA (parallel.ba.bundle_adjust_sharded)
  against the single-device ops.ba result.

Usage: python multihost_worker.py <proc_id> <n_procs> <port>
"""

import os
import sys

proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matchinglib_poselib_tpu.ops import ba, geometry as geo
from matchinglib_poselib_tpu.parallel import stream
from matchinglib_poselib_tpu.parallel.matching import sharded_match
from matchinglib_poselib_tpu.parallel.mesh import DB_AXIS, PAIRS_AXIS

devs = jax.devices()
assert len(devs) == 4 * n_procs, len(devs)
# pairs axis crosses the process boundary (DCN-style); db stays intra-process
mesh = Mesh(np.array(devs).reshape(n_procs, 4), (PAIRS_AXIS, DB_AXIS))


def put(arr, spec):
    """Global array from identical host-local data via callback slicing."""
    arr = np.asarray(arr)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


# --- 1. pod-wide kNN with planted queries --------------------------------
rng = np.random.default_rng(0)
n_db, n_q = 4 * 64, 32
ddb = rng.integers(0, 2**32, size=(n_db, 8), dtype=np.uint32)
plant = np.linspace(0, n_db - 1, n_q).astype(np.int32)
dq = ddb[plant]

res = sharded_match(
    mesh,
    put(dq, P()),
    put(ddb, P(DB_AXIS)),
    put(np.ones(n_q, np.float32), P()),
    put(np.ones(n_db, np.float32), P(DB_AXIS)),
)
idx = np.asarray(jax.device_get(res.idx))
mask = np.asarray(jax.device_get(res.mask))
assert mask.all(), f"proc {proc_id}: kNN lost planted matches"
assert (idx == plant).all(), f"proc {proc_id}: kNN indices wrong"
print(f"proc {proc_id}: pod-kNN ok ({mask.sum()}/{n_q} exact)", flush=True)

# --- 2. frame-window sharding + windowed pose consensus ------------------
F = 16  # frames; device i owns the contiguous window [i*2, i*2+2)
axis = np.array([0.3, 1.0, -0.2])
axis /= np.linalg.norm(axis)
ang = np.deg2rad(5.0)
Kx = np.array([
    [0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]
])
R_gt = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * (Kx @ Kx)
t_gt = np.array([0.8, -0.1, 0.2])
t_gt /= np.linalg.norm(t_gt)

Rs, ts, ws = [], [], []
for f in range(F):
    jit_ax = rng.normal(size=3)
    jit_ax /= np.linalg.norm(jit_ax)
    ja = np.deg2rad(rng.uniform(0, 0.2))
    Jx = np.array([
        [0, -jit_ax[2], jit_ax[1]],
        [jit_ax[2], 0, -jit_ax[0]],
        [-jit_ax[1], jit_ax[0], 0],
    ])
    Rs.append((np.eye(3) + np.sin(ja) * Jx + (1 - np.cos(ja)) * Jx @ Jx) @ R_gt)
    ts.append(t_gt + rng.normal(scale=1e-3, size=3))
    ws.append(rng.uniform(50, 200))

R_ml, t_ml, wsum = stream.windowed_pose_consensus(
    mesh,
    put(np.stack(Rs).astype(np.float32), P(PAIRS_AXIS)),
    put(np.stack(ts).astype(np.float32), P(PAIRS_AXIS)),
    put(np.asarray(ws, np.float32), P(PAIRS_AXIS)),
)
R_ml = np.asarray(jax.device_get(R_ml))
t_ml = np.asarray(jax.device_get(t_ml))
rd, td, _ = geo.compare_poses(
    jnp.asarray(R_ml), jnp.asarray(t_ml),
    jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32),
)
assert float(rd) < 0.3, f"proc {proc_id}: consensus R off by {float(rd)} deg"
assert float(td) < 0.5, f"proc {proc_id}: consensus t off by {float(td)} deg"
assert abs(float(jax.device_get(wsum)) - sum(ws)) < 1.0
print(f"proc {proc_id}: windowed consensus ok (rd={float(rd):.4f} deg)",
      flush=True)

# --- 3. distributed BA across the process boundary -----------------------
from matchinglib_poselib_tpu.parallel.ba import bundle_adjust_sharded

n_pts, n_cams = 64, 2
X = np.stack([
    rng.uniform(-2, 2, n_pts), rng.uniform(-2, 2, n_pts),
    rng.uniform(4, 10, n_pts),
], axis=1)
Rc = np.stack([np.eye(3), R_gt])
tc = np.stack([np.zeros(3), t_gt])
Kc = np.stack([np.eye(3)] * n_cams)
distc = np.zeros((n_cams, 5))
obs = np.zeros((n_pts, n_cams, 2))
for c in range(n_cams):
    Xc = X @ Rc[c].T + tc[c]
    obs[:, c] = Xc[:, :2] / Xc[:, 2:3]
obs += rng.normal(scale=1e-4, size=obs.shape)
vis = np.ones((n_pts, n_cams), np.float32)
free = np.array([0.0, 1.0], np.float32)

# perturb the second camera; BA must pull it back
Rp = Rc.copy()
jit = np.deg2rad(0.5)
Jx = np.array([[0, -jit, 0], [jit, 0, 0], [0, 0, 0]])
Rp[1] = (np.eye(3) + Jx) @ Rc[1]
u, _, vt = np.linalg.svd(Rp[1])
Rp[1] = u @ vt

args32 = lambda a: np.asarray(a, np.float32)
# db-axis sharding of points is intra-process here; the psum'd reduced
# camera system still crosses the pairs axis inside ops.ba via the named
# axis — points replicated over pairs, sharded over db
res_d = bundle_adjust_sharded(
    mesh,
    put(args32(obs), P(DB_AXIS)),
    put(args32(vis), P(DB_AXIS)),
    put(args32(Rp), P()),
    put(args32(tc), P()),
    put(args32(Kc), P()),
    put(args32(distc), P()),
    put(args32(X), P(DB_AXIS)),
    put(free, P()),
    iterations=8,
)
R1 = np.asarray(jax.device_get(res_d.R))[1]
rd_ba, td_ba, _ = geo.compare_poses(
    jnp.asarray(R1), jnp.asarray(np.asarray(jax.device_get(res_d.t))[1]),
    jnp.asarray(args32(Rc[1])), jnp.asarray(args32(tc[1])),
)
assert float(rd_ba) < 0.05, f"proc {proc_id}: BA rot residual {float(rd_ba)}"
print(f"proc {proc_id}: sharded BA ok (rd={float(rd_ba):.5f} deg)", flush=True)

# --- 4. distributed BA multi-iteration == single-device ------------------
# same problem, 8 LM iterations: the sharded solve (psum'd reduced camera
# system across the process boundary) must converge to the SAME camera
# blocks as ops.ba.bundle_adjust on one device
res_1dev = ba.bundle_adjust(
    jnp.asarray(args32(obs)), jnp.asarray(args32(vis)),
    jnp.asarray(args32(Rp)), jnp.asarray(args32(tc)),
    jnp.asarray(args32(Kc)), jnp.asarray(args32(distc)),
    jnp.asarray(args32(X)), jnp.asarray(free),
    iterations=8,
)
R_d = np.asarray(jax.device_get(res_d.R))
t_d = np.asarray(jax.device_get(res_d.t))
np.testing.assert_allclose(
    R_d, np.asarray(res_1dev.R), atol=5e-5,
    err_msg=f"proc {proc_id}: sharded BA cameras != single-device",
)
np.testing.assert_allclose(t_d, np.asarray(res_1dev.t), atol=5e-5)
print(f"proc {proc_id}: sharded BA == single-device ok", flush=True)

# --- 5. streaming path: sequential StereoRefine golden run vs the
# frame-window-sharded consensus (SURVEY.md §5.7 sequence scaling) -------
from matchinglib_poselib_tpu.config import (
    PoseConfig, RobustConfig, StereoRefineConfig,
)
from matchinglib_poselib_tpu.models.stereo_refine import StereoRefine

F_s, Kc_s = 8, 256
Kmat = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
sr = StereoRefine(
    Kmat, Kmat,
    cfg=StereoRefineConfig(
        max_pool_correspondences=2048,
        pose=PoseConfig(
            robust=RobustConfig(batch_hypotheses=64, max_batches=2)
        ),
    ),
    seed=3,
)
frames = []
for f in range(F_s):
    Xf = np.stack([
        rng.uniform(-2, 2, Kc_s), rng.uniform(-1.5, 1.5, Kc_s),
        rng.uniform(4, 12, Kc_s),
    ], axis=1)
    x1f = Xf / Xf[:, 2:3]
    X2f = Xf @ R_gt.T + t_gt
    x2f = X2f / X2f[:, 2:3]
    p1f = (x1f @ Kmat.T)[:, :2] + rng.normal(scale=0.3, size=(Kc_s, 2))
    p2f = (x2f @ Kmat.T)[:, :2] + rng.normal(scale=0.3, size=(Kc_s, 2))
    frames.append((p1f.astype(np.float32), p2f.astype(np.float32)))

gold_R, gold_t, gold_w = [], [], []
for p1f, p2f in frames:
    st = sr.add_new_correspondences(p1f, p2f)
    gold_R.append(st.R)
    gold_t.append(st.t)
    gold_w.append(max(st.inlier_ratio, 1e-3) * Kc_s)
assert sr.nr_estimation >= F_s - 1, (
    f"proc {proc_id}: golden StereoRefine rejected frames"
)

R_ml2, t_ml2, _ = stream.windowed_pose_consensus(
    mesh,
    put(np.stack(gold_R).astype(np.float32), P(PAIRS_AXIS)),
    put(np.stack(gold_t).astype(np.float32), P(PAIRS_AXIS)),
    put(np.asarray(gold_w, np.float32), P(PAIRS_AXIS)),
)
rd_s, td_s, _ = geo.compare_poses(
    jnp.asarray(np.asarray(jax.device_get(R_ml2))),
    jnp.asarray(np.asarray(jax.device_get(t_ml2))),
    jnp.asarray(sr.R_most_likely.astype(np.float32)),
    jnp.asarray(sr.t_most_likely.astype(np.float32)),
)
# the distributed consensus over the golden per-frame poses must agree
# with the sequential framework's own most-likely pose
assert float(rd_s) < 0.2, f"proc {proc_id}: stream consensus R {float(rd_s)}"
assert float(td_s) < 1.0, f"proc {proc_id}: stream consensus t {float(td_s)}"
print(f"proc {proc_id}: streaming consensus vs golden ok "
      f"(rd={float(rd_s):.4f} deg)", flush=True)
print(f"proc {proc_id}: ALL OK", flush=True)
