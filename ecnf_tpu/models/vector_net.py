"""Plain MLP vector field for non-graph (e.g. 2-D MoG) targets.

Parity with the reference's `examples/MoG_target.py:65-83` ``VectorNet``:
each hidden layer sees ``concat([x, t_embed])`` (fused here), GELU
activations, linear output back to the event dim.
"""
from typing import Optional, Sequence

import jax
from flax import linen as nn

from ecnf_tpu.ops.numerics import timestep_embedding
from ecnf_tpu.models.mlp import ConcatDense


class VectorNet(nn.Module):
    features: Sequence[int] = (512, 512, 512)
    embedding_dim: int = 32

    @nn.compact
    def __call__(
        self, x: jax.Array, t: jax.Array, features: Optional[jax.Array] = None
    ) -> jax.Array:
        assert x.ndim == 2 and t.ndim == 1
        event_dim = x.shape[-1]
        t_embed = timestep_embedding(t, self.embedding_dim)
        for feat in self.features:
            x = nn.activation.gelu(ConcatDense(feat)(x, t_embed))
        return nn.Dense(event_dim)(x)
