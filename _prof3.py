import time, jax, jax.numpy as jnp, numpy as np
from matchinglib_poselib_tpu.ops import solvers

def T(f, *a, n=20):
    for _ in range(3): out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e3

rng = np.random.default_rng(0)
B = 1024
x1 = jnp.asarray(rng.standard_normal((B,5,2)), jnp.float32)
x2 = jnp.asarray(rng.standard_normal((B,5,2)), jnp.float32)

A = jax.jit(solvers.epipolar_rows)(x1, x2)
print("epipolar_rows:", T(jax.jit(solvers.epipolar_rows), x1, x2))
nsf = jax.jit(solvers.nullspace_qr)
ns = nsf(A)
print("nullspace_qr:", T(nsf, A))
Eb = jnp.swapaxes(ns, -1, -2).reshape(ns.shape[:-2] + (4,3,3))
cvf = jax.jit(solvers._constraint_values)
F = cvf(Eb)
print("constraint_values:", T(cvf, Eb))
C = F @ solvers._VINV_T_NISTER.astype(F.dtype)
ssf = jax.jit(lambda C: solvers.solve_small(C[..., :, :10], C[..., :, 10:]))
print("solve_small 10x10:", T(ssf, C))
coef = jnp.asarray(rng.standard_normal((B,11)), jnp.float32)
rrf = jax.jit(solvers._real_roots_poly10)
print("real_roots_poly10:", T(rrf, coef))
xyz = jnp.asarray(rng.standard_normal((B,10,3)), jnp.float32)
pf = jax.jit(solvers._polish_xyz)
print("polish_xyz:", T(pf, Eb, xyz))
