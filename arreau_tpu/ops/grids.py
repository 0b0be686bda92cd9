"""Orientation-grid machinery: repulsion-optimized uniform S^2 grids, exact S^1
grids, and uniform random rotations — all pure JAX with explicit keys.

Capability parity with the reference's grid toolbox
(/root/reference/ponita/geometry/rotation.py:947-1009, repulsion.py:31-91,
rotation_2d.py:5-33) but implemented as a jit-compiled ``lax.fori_loop``
energy minimization instead of a torch SGD loop. The grid is computed once at
model setup (host side) and cached; it is a constant during training.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def spherical_to_euclid(g: jax.Array) -> jax.Array:
    """(beta, gamma) spherical coords ``[..., 2]`` -> unit vectors ``[..., 3]``."""
    beta, gamma = g[..., 0], g[..., 1]
    return jnp.stack(
        [jnp.sin(beta) * jnp.cos(gamma), jnp.sin(beta) * jnp.sin(gamma), jnp.cos(beta)],
        axis=-1,
    )


def euclid_to_spherical(x: jax.Array) -> jax.Array:
    return jnp.stack(
        [jnp.arccos(jnp.clip(x[..., 2], -1.0, 1.0)), jnp.arctan2(x[..., 1], x[..., 0])],
        axis=-1,
    )


def geodesic_distance_s2(r1: jax.Array, r2: jax.Array, eps: float = 1e-7) -> jax.Array:
    return jnp.arccos(jnp.clip(jnp.sum(r1 * r2, axis=-1), -1 + eps, 1 - eps))


def _repulsion_energy(grid_sph: jax.Array, n: int) -> jax.Array:
    """Mean Coulomb energy (k=2) over all distinct pairs of grid points.

    The reference sorts distances and drops the self column
    (repulsion.py:80-82); we mask the diagonal instead — same energy.
    """
    xyz = spherical_to_euclid(grid_sph)
    d = geodesic_distance_s2(xyz[:, None, :], xyz[None, :, :]) / jnp.pi
    energy = d ** (-2.0)
    off_diag = ~jnp.eye(n, dtype=bool)
    return jnp.where(off_diag, energy, 0.0).sum() / (n * (n - 1))


def uniform_grid_s2(
    n: int,
    key: jax.Array | None = None,
    steps: int = 100,
    step_size: float = 0.1,
    alpha: float = 0.001,
) -> jax.Array:
    """Repulsion-minimized near-uniform grid of ``n`` points on S^2, ``[n, 3]``.

    Random init on the sphere, then ``steps`` SGD iterations on the Coulomb
    energy of pairwise geodesic distances with annealed gradient noise —
    mirroring the reference's `uniform_grid_s2`/`repulse` procedure.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    init_key, noise_key = jax.random.split(key)
    x = jax.random.normal(init_key, (n, 3))
    grid0 = euclid_to_spherical(x / jnp.linalg.norm(x, axis=-1, keepdims=True))

    grad_fn = jax.grad(_repulsion_energy)

    def body(i, carry):
        grid, nkey = carry
        nkey, sub = jax.random.split(nkey)
        g = grad_fn(grid, n)
        g = g + (steps - i) / steps * alpha * jax.random.normal(sub, grid.shape)
        return grid - step_size * g, nkey

    grid, _ = jax.lax.fori_loop(0, steps, body, (grid0, noise_key))
    return spherical_to_euclid(grid)


@lru_cache(maxsize=None)
def cached_grid_s2(n: int, seed: int = 0) -> np.ndarray:
    """Host-cached S^2 grid (numpy, float64) — deterministic per (n, seed)."""
    with jax.enable_x64(True):
        grid = uniform_grid_s2(n, jax.random.PRNGKey(seed))
    return np.asarray(jax.device_get(grid), dtype=np.float64)


def uniform_grid_s1(n: int) -> jax.Array:
    """Exact uniform grid on the circle, ``[n, 2]`` (cos, sin) pairs."""
    angles = jnp.linspace(0.0, 2 * jnp.pi - 2 * jnp.pi / n, n)
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def random_quat(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    q = jax.random.normal(key, (*shape, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion ``[..., 4]`` (w, x, y, z) -> rotation matrix ``[..., 3, 3]``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def random_so3_matrix(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    """Uniform random SO(3) matrices ``[*shape, 3, 3]`` (via unit quaternions)."""
    return quat_to_matrix(random_quat(key, shape))


def random_so2_matrix(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    """Uniform random SO(2) matrices ``[*shape, 2, 2]``."""
    theta = jax.random.uniform(key, shape, minval=0.0, maxval=2 * jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
