"""Spherical-harmonic color evaluation, degrees 0-3.

The reference's CUDA rasterizer never implemented full SH (it uses DC only:
/root/reference/apps/gsrast/gscuda/GSCuda.cu:361-366, "0.5 + 0.4 * SH-DC").
This module implements the real thing with the standard real-SH constants used
by the 3DGS parameterization, plus the DC-only shortcut for A/B parity with
the reference.

All functions are per-Gaussian pure functions; vmap/batch over N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.45704579946446572,
    0.3731763325901154,
    -0.45704579946446572,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh(sh: jax.Array, direction: jax.Array, degree: int) -> jax.Array:
    """Evaluate SH color for view direction(s).

    Args:
      sh: (..., K, 3) coefficients, K >= (degree+1)^2, DC first.
      direction: (..., 3) unit view direction (gaussian center - camera pos,
        normalized).
      degree: static int in [0, 3].

    Returns:
      (..., 3) RGB with the +0.5 offset applied and clamped to >= 0, matching
      the 3DGS convention (the clamp mask is what the backward needs; autodiff
      through jnp.maximum reproduces it exactly).
    """
    if degree < 0 or degree > 3:
        raise ValueError(f"sh degree {degree} out of range")
    result = SH_C0 * sh[..., 0, :]
    if degree >= 1:
        x = direction[..., 0:1]
        y = direction[..., 1:2]
        z = direction[..., 2:3]
        result = (
            result
            - SH_C1 * y * sh[..., 1, :]
            + SH_C1 * z * sh[..., 2, :]
            - SH_C1 * x * sh[..., 3, :]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + SH_C2[0] * xy * sh[..., 4, :]
            + SH_C2[1] * yz * sh[..., 5, :]
            + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
            + SH_C2[3] * xz * sh[..., 7, :]
            + SH_C2[4] * (xx - yy) * sh[..., 8, :]
        )
    if degree >= 3:
        result = (
            result
            + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
            + SH_C3[1] * xy * z * sh[..., 10, :]
            + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
            + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
            + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
            + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
            + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
        )
    result = result + 0.5
    return jnp.maximum(result, 0.0)


def eval_sh_dc_reference(sh_dc: jax.Array) -> jax.Array:
    """The reference's DC-only shading: 0.5 + 0.4 * DC (GSCuda.cu:361-366,
    also the GL point-cloud shader's 0.2*sh+0.5 variant at
    shaders/pointcloud/vertex.glsl:13-15 uses a different gain)."""
    return 0.5 + 0.4 * sh_dc
