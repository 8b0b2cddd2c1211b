import time, jax, jax.numpy as jnp, numpy as np
from matchinglib_poselib_tpu.ops import solvers

def T(f, *a, n=20):
    t0=time.perf_counter(); out = f(*a); jax.block_until_ready(out)
    print("  compile+1st:", time.perf_counter()-t0)
    for _ in range(2): out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e3

rng = np.random.default_rng(0)
for B in [256, 1024]:
    x1 = jnp.asarray(rng.standard_normal((B,5,2)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B,5,2)), jnp.float32)
    f = jax.jit(solvers.solve_5pt_nister)
    print(f"nister B={B}: {T(lambda: f(x1,x2)):.2f} ms")
