"""Spatially-parallel MoVQ decode: rows sharded across a device mesh.

The torch reference decodes on one GPU, so its maximum output resolution is
capped by one device's memory (the full-size decoder at 4096² needs >16 GB
of fp32 activations for the last up-level alone).  `spatial_decode`
(kandinsky2_tpu/parallel/spatial.py) shards image ROWS across the mesh:
every 3x3 conv exchanges one-row halos over ICI, GroupNorm/SpatialNorm
statistics psum across devices, and the bottleneck attention gathers
keys/values — above 65k total tokens it auto-switches to exact ring
attention (K/V blocks ppermute through an online-softmax accumulator,
O(q_chunk·T/n) memory), which is what keeps the mid-block attention
feasible at 4096²+ — numerically the single-device decoder (tests/
test_spatial_parallel.py pins it to 1e-4).

Run on the virtual CPU mesh (no TPU pod needed to see it work):

    python examples/highres_sp_decode.py --cpu 8 --res 1024

`--full` uses the real 67M-param MoVQ config (slow on CPU; the layout a
v5e-8 would run).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=int, default=512, help="output resolution")
ap.add_argument("--full", action="store_true",
                help="real 67M MoVQ config instead of the demo-size one")
ap.add_argument("--cpu", type=int, default=0, metavar="N",
                help="force an N-device virtual CPU mesh (env vars alone "
                "lose the platform race to the ambient TPU plugin)")
args = ap.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.cpu}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from kandinsky2_tpu.models.movq import MOVQ
from kandinsky2_tpu.parallel.spatial import spatial_decode

devs = jax.devices()
n = len(devs)
mesh = Mesh(np.asarray(devs), ("sp",))
print(f"{n} {devs[0].platform} devices, image rows sharded {n}-way")

if args.full:
    movq = MOVQ()  # 67M: ch=128, ch_mult (1,2,2,4), attn at 32²
else:
    movq = MOVQ(z_channels=4, embed_dim=4, n_embed=256, ch=32,
                ch_mult=(1, 2, 2, 4), num_res_blocks=1,
                attn_resolutions=(32,), resolution=256)

lat = args.res // 8
assert lat % n == 0, f"latent rows {lat} must divide {n}"
# conv/norm params are resolution-independent: init tiny, decode huge
params = jax.jit(
    lambda: movq.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
)()["params"]

codes = jax.random.randint(jax.random.PRNGKey(1), (1, lat, lat), 0,
                           movq.n_embed)
t0 = time.time()
img = spatial_decode(movq, params, codes, mesh, axis="sp")
img = np.asarray(img)
print(f"decoded {args.res}²x{img.shape[-1]} in {time.time()-t0:.1f}s "
      f"(first call includes compile); finite={np.isfinite(img).all()}")
assert np.isfinite(img).all()
