"""Equivariance test harness: random rotations and assertion helpers.

Parity with the reference's `ecnf/utils/test.py:15-76`.
"""
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def get_rotation_matrix_from_angle_2d(angle: jax.Array) -> jax.Array:
    return jnp.array(
        [[jnp.cos(angle), -jnp.sin(angle)], [jnp.sin(angle), jnp.cos(angle)]]
    )


def get_rotation_matrix_from_z_a1_a2(
    z: jax.Array, a1: jax.Array, a2: jax.Array
) -> jax.Array:
    """Uniform 3-D rotation from (z, a1, a2) parameterization.

    Parity: reference `ecnf/utils/test.py:15-43` — rotate about x by a2,
    about y so the x-axis lands at height z, then about z by a1.
    """
    a0 = jnp.arctan2(-z, jnp.sqrt(1 - z**2))
    R1 = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, jnp.cos(a2), -jnp.sin(a2)],
            [0.0, jnp.sin(a2), jnp.cos(a2)],
        ]
    )
    R2 = jnp.array(
        [
            [jnp.cos(a0), 0.0, jnp.sin(a0)],
            [0.0, 1.0, 0.0],
            [-jnp.sin(a0), 0.0, jnp.cos(a0)],
        ]
    )
    R3 = jnp.array(
        [
            [jnp.cos(a1), -jnp.sin(a1), 0.0],
            [jnp.sin(a1), jnp.cos(a1), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    return R3 @ R2 @ R1


def random_rotation_matrix(key: jax.Array, dim: int) -> jax.Array:
    """Uniformly random rotation in 2-D or 3-D (reference `test.py:46-57`)."""
    if dim == 3:
        key1, key2, key3 = jax.random.split(key, 3)
        z = jax.random.uniform(key1, minval=-1.0, maxval=1.0)
        a1 = jax.random.uniform(key2, minval=-jnp.pi, maxval=jnp.pi)
        a2 = jax.random.uniform(key3, minval=-jnp.pi, maxval=jnp.pi)
        return get_rotation_matrix_from_z_a1_a2(z, a1, a2)
    assert dim == 2
    angle = jax.random.uniform(key) * jnp.pi * 2 - jnp.pi
    return get_rotation_matrix_from_angle_2d(angle)


def assert_function_is_equivariant(
    equivariant_fn: Callable[[jax.Array], jax.Array],
    n_nodes: int,
    dim: int = 3,
    key: jax.Array = None,
    atol: float = 1e-6,
) -> None:
    """Assert ``f(R x) == R f(x)`` for a random rotation R.

    Parity: reference `ecnf/utils/test.py:60-76`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    key1, key2 = jax.random.split(key)
    x = jax.random.normal(key1, (n_nodes, dim))
    R = random_rotation_matrix(key2, dim)
    out_then_g = (R @ equivariant_fn(x).T).T
    g_then_out = equivariant_fn((R @ x.T).T)
    np.testing.assert_allclose(out_then_g, g_then_out, atol=atol, rtol=atol)
