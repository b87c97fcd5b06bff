"""Isolate the blend kernel pair on TPU with tiny synthetic inputs.

Builds a (FROWS, C) lane-major packed feature array by hand (r3 layout,
pallas_blend.py docstring), runs forward then backward, checks finiteness.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np
from gsrast_tpu.render import pallas_blend as pb

print("backend:", jax.default_backend())
gh, gw = 2, 2
T = gh * gw
tile_h, tile_w = 8, 128
P = tile_h * tile_w
# two chunks for tile 0, one for tile 1, zero for tile 2, one for tile 3
counts = [2 * pb.CHUNK, pb.CHUNK, 0, pb.CHUNK]
starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
C = int(starts[-1])
rng = np.random.RandomState(0)
feat = np.zeros((pb.FROWS, C), np.float32)
feat[pb.F_MX] = rng.uniform(0, 256, C)
feat[pb.F_MY] = rng.uniform(0, 16, C)
feat[pb.F_CA] = 0.05
feat[pb.F_CC] = 0.05
feat[pb.F_OP] = rng.uniform(0.2, 0.9, C)
feat[pb.F_R:pb.F_B + 1] = rng.uniform(0, 1, (3, C))
tile_of_slot = np.searchsorted(starts[1:], np.arange(C), side="right")
feat[pb.F_TID] = tile_of_slot.astype(np.float32)
packed = jnp.asarray(feat)
tile_starts = jnp.asarray(starts)

print("forward...")
out = jax.jit(
    lambda f, s: pb.blend_forward(f, s, gh, gw, tile_h, tile_w)
)(packed, tile_starts)
jax.block_until_ready(out)
rgb = out[:, pb.OC_R:pb.OC_B + 1, :]
ft = out[:, pb.OC_FT, :]
nc = out[:, pb.OC_NC, :]
print("fwd ok", rgb.shape, float(rgb.mean()), float(ft.mean()),
      int(nc.max()))

print("backward...")
aux = jnp.concatenate(
    [jnp.ones((T, 3, P), jnp.float32),       # d_rgb rows
     jnp.zeros((T, 1, P), jnp.float32),      # d_ft
     ft[:, None, :], nc[:, None, :],
     jnp.zeros((T, 2, P), jnp.float32)], axis=1)
dfeat = jax.jit(
    lambda f, s, a: pb.blend_backward(f, s, a, gh, gw, tile_h, tile_w)
)(packed, tile_starts, aux)
jax.block_until_ready(dfeat)
assert dfeat.shape == (pb.FROWS, C), dfeat.shape
assert bool(jnp.all(jnp.isfinite(dfeat)))
print("bwd ok", dfeat.shape, float(jnp.abs(dfeat).max()))
print("BWD_TPU_OK")
