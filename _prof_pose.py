import time, json, pathlib
import numpy as np, jax, jax.numpy as jnp
from matchinglib_poselib_tpu.config import (DetectorConfig, DescriptorConfig,
    MatchingConfig, PoseConfig, RobustConfig)
from matchinglib_poselib_tpu.models import pipeline
from matchinglib_poselib_tpu.utils import io

stereo = pathlib.Path("/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo")
img1 = jnp.asarray(io.load_image_gray(stereo/"left_0000000000.png"))
img2 = jnp.asarray(io.load_image_gray(stereo/"right_0000000000.png"))
calib = io.load_kitti_calib(stereo/"calib_cam_to_cam.txt")
K1 = jnp.asarray(calib.K0, jnp.float32); K2 = jnp.asarray(calib.K1, jnp.float32)
d1 = jnp.asarray(calib.dist0, jnp.float32); d2 = jnp.asarray(calib.dist1, jnp.float32)

det = DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0)
desc = DescriptorConfig(kind="ORB")
match = MatchingConfig(matcher_name="GMBSOF")

def T(f, *a, n=20):
    for _ in range(3): out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e3

corrj = jax.jit(lambda a,b: pipeline.get_correspondences(a,b,det,desc,match))
corr = corrj(img1, img2)
print("corr_ms", T(lambda: corrj(img1,img2)))
key = jax.random.PRNGKey(0)

for bh, mb in [(256,4),(256,1),(64,1),(512,1),(1024,1)]:
    pc = PoseConfig(robust=RobustConfig(batch_hypotheses=bh, max_batches=mb))
    pj = jax.jit(lambda c,k,pc=pc: pipeline.estimate_pose(c.pts1,c.pts2,c.mask,c.quality,K1,K2,d1,d2,pc,k))
    print(f"pose bh={bh} mb={mb}: {T(lambda: pj(corr,key)):.2f} ms")
