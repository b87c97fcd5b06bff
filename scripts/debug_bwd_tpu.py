"""Isolate the backward kernel on TPU with tiny synthetic inputs."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np
from gsrast_tpu.render import pallas_blend as pb

print("backend:", jax.default_backend())
gh, gw = 2, 2
T = gh * gw
# two chunks for tile 0, one for tile 1, zero for tile 2, one for tile 3
counts = [2 * pb.CHUNK, pb.CHUNK, 0, pb.CHUNK]
starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
C = int(starts[-1])
R = C // pb.GPR
rng = np.random.RandomState(0)
feat = np.zeros((C, pb.NFEAT), np.float32)
feat[:, pb.F_MX] = rng.uniform(0, 256, C)
feat[:, pb.F_MY] = rng.uniform(0, 16, C)
feat[:, pb.F_CA] = 0.05
feat[:, pb.F_CC] = 0.05
feat[:, pb.F_OP] = rng.uniform(0.2, 0.9, C)
feat[:, pb.F_R:pb.F_B + 1] = rng.uniform(0, 1, (C, 3))
packed = jnp.asarray(feat.reshape(R, pb.GPR * pb.NFEAT))
tile_starts = jnp.asarray(starts)

print("forward...")
rgb, ft, nc = jax.jit(
    lambda f, s: pb.blend_forward(f, s, gh, gw)
)(packed, tile_starts)
jax.block_until_ready(rgb)
print("fwd ok", rgb.shape, float(rgb.mean()), float(ft.mean()), int(nc.max()))

print("backward...")
d_rgb = jnp.ones_like(rgb)
d_ft = jnp.zeros_like(ft)
dfeat = jax.jit(
    lambda *a: pb.blend_backward(*a, gh, gw)
)(packed, tile_starts, ft, nc, d_rgb, d_ft)
jax.block_until_ready(dfeat)
print("bwd ok", dfeat.shape, float(jnp.abs(dfeat).max()))
print("BWD_TPU_OK")
