"""Zero-centre-of-mass Gaussian base distribution (batched, functional).

The reference wraps distrax: `CentreGravityGaussian` / `FlatZeroCoMGaussian`
(`ecnf/cnf/zero_com_base.py:10-94`) composed with a scale bijector whose
log-det carries the ``(N-1)/N`` zero-CoM correction
(`ecnf/cnf/build_cnf.py:44-61`).  Here it is a single immutable dataclass
with batched ``sample`` / ``log_prob`` on flat ``[..., N*D]`` coordinates —
no distribution-library machinery, just the closed forms:

- density lives on the ``(N-1)*D``-dimensional zero-CoM hyperplane;
  ``log p(x) = -0.5 * ||x/s||^2 - 0.5*(N-1)*D*log(2*pi) - (N-1)*D*log(s)``
- sampling projects an iid Gaussian onto the hyperplane by removing the
  per-sample mean (valid because the Gaussian is rotation invariant).
"""
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def remove_mean(x: jax.Array) -> jax.Array:
    """Subtract the node-axis mean: ``[..., N, D] -> [..., N, D]``.

    Parity: reference `ecnf/cnf/zero_com_base.py:59-62`.
    """
    return x - jnp.mean(x, axis=-2, keepdims=True)


def centre_gravity_zero_gaussian_log_likelihood(x: jax.Array) -> jax.Array:
    """Log density of the unit zero-CoM Gaussian at ``x`` ([..., N, D]).

    Assumes ``x`` already has zero CoM.  Parity: reference
    `ecnf/cnf/zero_com_base.py:64-84` (DoF ``(N-1)*D``).
    """
    N, D = x.shape[-2:]
    r2 = jnp.sum(x**2, axis=(-1, -2))
    degrees_of_freedom = (N - 1) * D
    log_normalizing_constant = -0.5 * degrees_of_freedom * np.log(2 * np.pi)
    return -0.5 * r2 + log_normalizing_constant


@dataclass(frozen=True)
class ZeroCoMGaussian:
    """Scaled Gaussian on the zero-CoM hyperplane, flat coordinates.

    Equivalent to the reference's
    ``Transformed(FlatZeroCoMGaussian(dim, n_nodes), scale_bijector_zero_com)``
    (`ecnf/cnf/build_cnf.py:44-61`): samples are ``scale * z`` with ``z`` a
    unit zero-CoM Gaussian, and the scale's log-det uses the effective
    ``(N-1)*D`` degrees of freedom.
    """

    n_nodes: int
    dim: int
    scale: float = 1.0

    @property
    def event_dim(self) -> int:
        return self.n_nodes * self.dim

    @property
    def degrees_of_freedom(self) -> int:
        return (self.n_nodes - 1) * self.dim

    def _unflatten(self, x_flat: jax.Array) -> jax.Array:
        return jnp.reshape(x_flat, (*x_flat.shape[:-1], self.n_nodes, self.dim))

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...]) -> jax.Array:
        """Draw ``[*batch_shape, N*D]`` flat samples."""
        z = jax.random.normal(key, (*batch_shape, self.n_nodes, self.dim))
        z = remove_mean(z)
        out = self.scale * z
        return jnp.reshape(out, (*batch_shape, self.event_dim))

    def log_prob(self, x_flat: jax.Array) -> jax.Array:
        """Log density at flat ``[..., N*D]`` points (mean removed first,
        matching the reference's projection-before-scoring)."""
        x = self._unflatten(x_flat) / self.scale
        x = remove_mean(x)
        base = centre_gravity_zero_gaussian_log_likelihood(x)
        return base - self.degrees_of_freedom * np.log(self.scale)

    def sample_and_log_prob(
        self, key: jax.Array, batch_shape: Tuple[int, ...]
    ) -> Tuple[jax.Array, jax.Array]:
        x = self.sample(key, batch_shape)
        return x, self.log_prob(x)


@dataclass(frozen=True)
class DiagGaussian:
    """Plain isotropic Gaussian base (flat coords) for non-molecular targets.

    Equivalent of the reference MoG example's
    ``distrax.MultivariateNormalDiag(zeros(dim), ones(dim)*scale)``
    (`examples/MoG_target.py:103`).
    """

    dim: int
    scale: float = 1.0

    @property
    def event_dim(self) -> int:
        return self.dim

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...]) -> jax.Array:
        return self.scale * jax.random.normal(key, (*batch_shape, self.dim))

    def log_prob(self, x: jax.Array) -> jax.Array:
        d = self.dim
        r2 = jnp.sum((x / self.scale) ** 2, axis=-1)
        return -0.5 * r2 - 0.5 * d * np.log(2 * np.pi) - d * np.log(self.scale)

    def sample_and_log_prob(self, key, batch_shape):
        x = self.sample(key, batch_shape)
        return x, self.log_prob(x)
