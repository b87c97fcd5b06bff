"""3D covariance construction and EWA projection to 2D.

Pure per-Gaussian math, re-derived from the splatting formulation the
reference implements in CUDA:
  * quat -> rotation matrix         (reference GSCuda.cu:157-162)
  * cov3D = R S S^T R^T (sym upper) (reference GSCuda.cu:168-195)
  * EWA cov2D = J W Sigma W^T J^T
    + 0.3 I dilation                (reference GSCuda.cu:197-231)
  * conic = inverse(cov2D), radius = ceil(3 sqrt(lambda_max))
                                    (reference GSCuda.cu:329-341)

Everything is float32, vector-shaped, and differentiable by jax.grad (the
hand-written Pallas backward is checked against autodiff of these).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import config as cfg


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) -> (3, 3) rotation matrix.

    Accepts batched (..., 4). The caller is responsible for normalization
    (GaussianScene.rotations()).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def compute_cov3d(scale: jax.Array, quat: jax.Array) -> jax.Array:
    """Sigma = R S S^T R^T, returned as the symmetric upper triangle
    (..., 6): [xx, xy, xz, yy, yz, zz] (reference GSCuda.cu:168-195 stores the
    same 6 floats).

    All geometry matmuls force full f32 precision: the platform default is
    bf16-pass matmul, which is catastrophic for conic inversion (SURVEY.md §7
    "fp32 sensitivity").
    """
    rot = quat_to_rotmat(quat)  # (..., 3, 3)
    m = rot * scale[..., None, :]  # R @ diag(s)
    sigma = jnp.matmul(m, jnp.swapaxes(m, -1, -2), precision=jax.lax.Precision.HIGHEST)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def cov3d_to_matrix(cov6: jax.Array) -> jax.Array:
    """(..., 6) upper triangle -> (..., 3, 3) symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def compute_cov2d(
    mean_view: jax.Array,
    cov6: jax.Array,
    view_rot: jax.Array,
    focal_x: jax.Array,
    focal_y: jax.Array,
    tan_fov_x: jax.Array,
    tan_fov_y: jax.Array,
) -> jax.Array:
    """EWA splatting: project a 3D covariance to screen space.

    Args:
      mean_view: (..., 3) gaussian center in camera space (z = depth > 0).
      cov6: (..., 6) world-space covariance upper triangle.
      view_rot: (3, 3) world->camera rotation (view[:3, :3]).
      focal_*: pixels; tan_fov_*: half-angle tangents.

    Returns:
      (..., 3): 2D covariance [a, b, c] = [[a, b], [b, c]] with the +0.3
      low-pass dilation on the diagonal (reference GSCuda.cu:197-231).
    """
    tx, ty, tz = mean_view[..., 0], mean_view[..., 1], mean_view[..., 2]
    # Clamp the tangent-plane position to 1.3x the frustum (GSCuda.cu:205-210).
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    txtz = jnp.clip(tx / tz, -lim_x, lim_x)
    tytz = jnp.clip(ty / tz, -lim_y, lim_y)
    tx = txtz * tz
    ty = tytz * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # Affine Jacobian of the perspective projection (GSCuda.cu:212-217).
    zeros = jnp.zeros_like(tx)
    j = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1),
            jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (..., 2, 3)
    hi = jax.lax.Precision.HIGHEST
    t = jnp.matmul(j, view_rot, precision=hi)  # (..., 2, 3)
    sigma = cov3d_to_matrix(cov6)  # (..., 3, 3)
    cov2d = jnp.matmul(
        jnp.matmul(t, sigma, precision=hi), jnp.swapaxes(t, -1, -2), precision=hi
    )  # (..., 2, 2)
    a = cov2d[..., 0, 0] + cfg.COV2D_DILATION
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + cfg.COV2D_DILATION
    return jnp.stack([a, b, c], axis=-1)


def conic_and_radius(cov2d: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Invert the 2D covariance and bound the splat's pixel extent.

    Returns (conic (...,3), radius (...,), valid (...,)): conic = [A, B, C]
    of the quadratic form; radius = ceil(3 sqrt(lambda_max)) via the
    eigenvalue bound mid +- sqrt(mid^2 - det) (reference GSCuda.cu:329-341);
    valid = det > 0 (degenerate covariances are culled, GSCuda.cu:331-335).
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    valid = det > 0.0
    det_safe = jnp.where(valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(cfg.GAUSSIAN_EXTENT_SIGMA * jnp.sqrt(lam_max))
    radius = jnp.where(valid, radius, 0.0)
    return conic, radius, valid
