"""2-D mixture-of-Gaussians sanity target (pure JAX, no distrax).

Parity with the reference MoG example's target construction
(`examples/MoG_target.py:21-44`): 8 equally-weighted components, means
``uniform(-1, 1) * 10`` from ``PRNGKey(0)``, per-dim scale
``softplus(0.1)`` (the reference passes the softplus'd "variance" directly
as the Normal scale — reproduced faithfully).
"""
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MoGTarget:
    n_mixes: int = 8
    dim: int = 2
    loc_scaling: float = 10.0
    log_var_scaling: float = 0.1
    seed: int = 0

    @property
    def means(self) -> jax.Array:
        key = jax.random.PRNGKey(self.seed)
        return (
            jax.random.uniform(
                key, shape=(self.n_mixes, self.dim), minval=-1.0, maxval=1.0
            )
            * self.loc_scaling
        )

    @property
    def scales(self) -> jax.Array:
        log_var = jnp.ones((self.n_mixes, self.dim)) * self.log_var_scaling
        return jax.nn.softplus(log_var)

    def log_prob(self, x: jax.Array) -> jax.Array:
        """[..., dim] -> [...] mixture log-density."""
        means, scales = self.means, self.scales
        # Component log-pdfs: [..., n_mixes]
        z = (x[..., None, :] - means) / scales
        comp = -0.5 * jnp.sum(z**2, axis=-1) - jnp.sum(jnp.log(scales), axis=-1) \
            - 0.5 * self.dim * np.log(2 * np.pi)
        return jax.nn.logsumexp(comp, axis=-1) - np.log(self.n_mixes)

    def sample(self, key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
        k1, k2 = jax.random.split(key)
        comps = jax.random.randint(k1, shape, 0, self.n_mixes)
        eps = jax.random.normal(k2, (*shape, self.dim))
        return self.means[comps] + eps * self.scales[comps]
