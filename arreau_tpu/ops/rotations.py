"""SO(3) rotation toolbox: parameterization converters, geodesic distances,
random sampling and interpolation — pure jnp.

Capability parity with the reference's rotation utilities
(/root/reference/ponita/geometry/rotation.py, ~1000 LoC of torch converters;
the grid machinery itself lives in arreau_tpu/ops/grids.py). Conventions:
quaternions are (w, x, y, z) unit quaternions; Euler angles are intrinsic
ZYZ (alpha, beta, gamma), matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arreau_tpu.ops.grids import (  # noqa: F401  (re-exported for one-stop API)
    quat_to_matrix,
    random_quat,
    random_so2_matrix,
    random_so3_matrix,
)

_EPS = 1e-9


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion ``[..., 4]`` (w,x,y,z).

    Shepperd's method via the four candidate denominators, selected per
    element for numerical robustness (branch-free, jit-safe)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    qw = jnp.sqrt(jnp.maximum(1 + tr, 0.0)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 0.0)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 0.0)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 0.0)) / 2

    # fix signs relative to the dominant component
    case = jnp.argmax(jnp.stack([qw, qx, qy, qz], axis=-1), axis=-1)
    qx_w = jnp.copysign(qx, m21 - m12)
    qy_w = jnp.copysign(qy, m02 - m20)
    qz_w = jnp.copysign(qz, m10 - m01)

    qw_x = jnp.copysign(qw, m21 - m12)
    qy_x = jnp.copysign(qy, m01 + m10)
    qz_x = jnp.copysign(qz, m02 + m20)

    qw_y = jnp.copysign(qw, m02 - m20)
    qx_y = jnp.copysign(qx, m01 + m10)
    qz_y = jnp.copysign(qz, m12 + m21)

    qw_z = jnp.copysign(qw, m10 - m01)
    qx_z = jnp.copysign(qx, m02 + m20)
    qy_z = jnp.copysign(qy, m12 + m21)

    quats = jnp.stack(
        [
            jnp.stack([qw, qx_w, qy_w, qz_w], axis=-1),
            jnp.stack([qw_x, qx, qy_x, qz_x], axis=-1),
            jnp.stack([qw_y, qx_y, qy, qz_y], axis=-1),
            jnp.stack([qw_z, qx_z, qy_z, qz], axis=-1),
        ],
        axis=-2,
    )  # [..., 4 cases, 4]
    q = jnp.take_along_axis(quats, case[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def euler_to_matrix(euler: jax.Array) -> jax.Array:
    """Intrinsic ZYZ Euler angles ``[..., 3]`` (alpha, beta, gamma) -> matrix."""
    a, b, g = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cg, sg = jnp.cos(g), jnp.sin(g)
    row0 = jnp.stack([ca * cb * cg - sa * sg, -ca * cb * sg - sa * cg, ca * sb], -1)
    row1 = jnp.stack([sa * cb * cg + ca * sg, -sa * cb * sg + ca * cg, sa * sb], -1)
    row2 = jnp.stack([-sb * cg, sb * sg, cb], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler(m: jax.Array) -> jax.Array:
    """Matrix -> intrinsic ZYZ Euler angles (alpha, beta, gamma)."""
    beta = jnp.arccos(jnp.clip(m[..., 2, 2], -1.0, 1.0))
    alpha = jnp.arctan2(m[..., 1, 2], m[..., 0, 2])
    gamma = jnp.arctan2(m[..., 2, 1], -m[..., 2, 0])
    return jnp.stack([alpha, beta, gamma], axis=-1)


def quat_to_euler(q: jax.Array) -> jax.Array:
    return matrix_to_euler(quat_to_matrix(q))


def euler_to_quat(euler: jax.Array) -> jax.Array:
    return matrix_to_quat(euler_to_matrix(euler))


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def geodesic_distance_quat(q1: jax.Array, q2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic distance on SO(3) via |<q1, q2>| (double cover)."""
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return jnp.arccos(jnp.clip(dot, -1 + eps, 1 - eps))


def geodesic_distance_matrix(m1: jax.Array, m2: jax.Array) -> jax.Array:
    """Rotation angle of m1^T m2."""
    rel = jnp.swapaxes(m1, -1, -2) @ m2
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1) / 2, -1.0, 1.0))


def slerp(q1: jax.Array, q2: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions (shortest arc)."""
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - _EPS))
    sin_theta = jnp.maximum(jnp.sin(theta), _EPS)
    w1 = jnp.sin((1 - t) * theta) / sin_theta
    w2 = jnp.sin(t * theta) / sin_theta
    out = w1 * q1 + w2 * q2
    # fall back to lerp for nearly-identical quaternions
    near = dot > 1 - 1e-6
    lerp = (1 - t) * q1 + t * q2
    out = jnp.where(near, lerp, out)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def apply_rotation(m: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``[..., 3]`` by matrices ``[..., 3, 3]``."""
    return jnp.einsum("...ij,...j->...i", m, v)
