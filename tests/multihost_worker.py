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
print(f"proc {proc_id}: ALL OK", flush=True)
