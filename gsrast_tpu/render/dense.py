"""Dense (tile-free) reference renderer — the correctness oracle.

Blends every Gaussian into every pixel in front-to-back depth order with
exactly the reference blend semantics (/root/reference/apps/gsrast/gscuda/
GSCuda.cu:543-677): power = -1/2 (A dx^2 + C dy^2) - B dx dy, skip power > 0,
alpha = min(0.99, opacity * e^power), skip alpha < 1/255, terminate the pixel
once T (1 - alpha) < 1e-4, composite background with the residual
transmittance. O(N * pixels) and fully differentiable by jax.grad — this is
the oracle the tiled and Pallas paths are validated against (the role the
empty diff-gaussian-rasterization submodule plays for the reference,
GSGaussians.cpp:16-23).

The sequential early-termination recurrence is evaluated in closed form:
  P_i = prod_{j<=i} (1 - a_j),  T_i = P_{i-1},
  include_i = (P_i >= T_MIN)           (monotone — exact early-stop mask)
  C = sum include_i * valid_i * c_i a_i T_i,  T_final = min included P_i.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..camera import Camera
from ..ops.preprocess import Preprocessed, preprocess
from ..scene.gaussians import ActivatedGaussians


class RenderOutput(NamedTuple):
    image: jax.Array      # (H, W, 3)
    final_t: jax.Array    # (H, W) residual transmittance
    n_contrib: jax.Array  # (H, W) int32, 1-based index of last contributor
    stats: dict


def blend_pixels(
    pix_x: jax.Array,
    pix_y: jax.Array,
    mean2d: jax.Array,
    conic: jax.Array,
    color: jax.Array,
    opacity: jax.Array,
    active: jax.Array,
    background: jax.Array,
):
    """Blend depth-sorted Gaussians into a batch of pixels.

    Args:
      pix_x, pix_y: (P,) pixel centers.
      mean2d/conic/color/opacity: (G, ...) per-Gaussian screen state, already
        sorted front-to-back.
      active: (G, P) or (G, 1) bool — whether gaussian g may touch pixel p
        (tile-rect membership for parity with the tiled path, or just
        visibility).
      background: (3,).

    Returns: (color (P, 3), final_t (P,), n_contrib (P,))
    """
    dx = mean2d[:, 0:1] - pix_x[None, :]  # (G, P)
    dy = mean2d[:, 1:2] - pix_y[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(cfg.ALPHA_MAX, opacity[:, None] * jnp.exp(power))
    valid = active & (power <= 0.0) & (alpha >= cfg.ALPHA_MIN)
    alpha_eff = jnp.where(valid, alpha, 0.0)

    p_cum = jnp.cumprod(1.0 - alpha_eff, axis=0)  # (G, P): P_i
    t_before = jnp.concatenate(
        [jnp.ones_like(p_cum[:1]), p_cum[:-1]], axis=0
    )  # T_i
    include = p_cum >= cfg.TRANSMITTANCE_MIN
    w = jnp.where(include & valid, alpha_eff * t_before, 0.0)  # (G, P)
    out = jnp.einsum("gp,gc->pc", w, color, precision=jax.lax.Precision.HIGHEST)

    final_t = jnp.min(
        jnp.where(include, p_cum, jnp.inf), axis=0, initial=1.0
    )
    final_t = jnp.minimum(final_t, 1.0)
    out = out + final_t[:, None] * background[None, :]

    # n_contrib (r5): count of include=True positions — the blend length
    # before saturation (see render/tiled.py for the definition note). The
    # dense path has no segment bound, so `active` stands in for membership.
    n_contrib = jnp.sum(
        (include & active).astype(jnp.int32), axis=0
    )
    return out, final_t, n_contrib


def render_dense(
    gaussians: ActivatedGaussians,
    camera: Camera,
    render_cfg: cfg.RenderConfig = cfg.RenderConfig(),
    row_chunk: int = 64,
    match_tiled_rects: bool = False,
) -> RenderOutput:
    """Render by brute force. `match_tiled_rects=True` additionally restricts
    each Gaussian to the pixels of its covered tile rectangle, making the
    output bit-comparable to the tiled path (same inclusion set)."""
    prep = preprocess(gaussians, camera, render_cfg)
    h, w = camera.height, camera.width

    # Global front-to-back order (stable, so depth ties match the tiled
    # path's stable (tile|depth) sort).
    order = jnp.argsort(prep.depth, stable=True)
    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    color = prep.color[order]
    opacity = prep.opacity[order]
    radius = prep.radius[order]
    rect = jax.tree.map(lambda x: x[order], prep.rect)

    background = jnp.asarray(render_cfg.background, jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    n_rows = -(-h // row_chunk)

    def do_rows(row0):
        ry = row0 + jnp.arange(row_chunk, dtype=jnp.float32)  # may overhang
        py, px = jnp.meshgrid(jnp.minimum(ry, h - 1), xs, indexing="ij")
        pshape = py.shape
        pxf, pyf = px.reshape(-1), py.reshape(-1)
        visible = (radius > 0)[:, None]
        if match_tiled_rects:
            tx = (pxf[None, :] // render_cfg.tile_w).astype(jnp.int32)
            ty = (pyf[None, :] // render_cfg.tile_h).astype(jnp.int32)
            inside = (
                (tx >= rect.x_min[:, None]) & (tx < rect.x_max[:, None])
                & (ty >= rect.y_min[:, None]) & (ty < rect.y_max[:, None])
            )
            active = visible & inside
        else:
            active = visible & jnp.ones((1, pxf.shape[0]), bool)
        out, final_t, n_contrib = blend_pixels(
            pxf, pyf, mean2d, conic, color, opacity, active, background
        )
        return (
            out.reshape(pshape + (3,)),
            final_t.reshape(pshape),
            n_contrib.reshape(pshape),
        )

    rows0 = jnp.arange(n_rows) * row_chunk
    img, final_t, n_contrib = jax.lax.map(do_rows, rows0)
    img = img.reshape(n_rows * row_chunk, w, 3)[:h]
    final_t = final_t.reshape(n_rows * row_chunk, w)[:h]
    n_contrib = n_contrib.reshape(n_rows * row_chunk, w)[:h]
    stats = {"num_visible": jnp.sum(prep.radius > 0)}
    return RenderOutput(image=img, final_t=final_t, n_contrib=n_contrib, stats=stats)
