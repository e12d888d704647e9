"""MLP / StableMLP with concat-free fused first layers.

Math parity with the reference's `ecnf/nets/mlp.py:7-72`, plus one TPU-first
transform: every first layer that the reference feeds with
``concat([a, b, ...], -1)`` is computed here as a sum of split matmuls
(``a @ W_a + b @ W_b + ...``) via :class:`ConcatDense`.  This is
algebraically identical (and the single fused kernel parameter keeps the
exact same init distribution as ``Dense`` on the concatenation), but avoids
materializing ``[B, N, N, 2H+1]`` concatenated edge tensors in HBM — each
operand is matmul'd in its compact shape and only the (cheap, fused-by-XLA)
broadcast add produces the edge-shaped result.
"""
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Note on compute dtype: modules take an optional ``dtype`` (e.g.
# ``jnp.bfloat16``).  Parameters are always stored in float32; activations
# and matmuls run in ``dtype`` (flax's standard mixed-precision convention).
# On TPU this halves HBM traffic — the hot path here is bandwidth-bound.


class ConcatDense(nn.Module):
    """``Dense(features)(concat(inputs, -1))`` as split matmuls.

    A single ``[sum(widths), features]`` kernel is created (so initialization
    matches a Dense over the concatenation exactly) and sliced per input.
    Inputs must be pre-shaped to broadcast against each other *after* their
    matmuls; broadcasting size-1 axes cost nothing.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.linear.default_kernel_init
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, *inputs: jax.Array) -> jax.Array:
        widths = tuple(int(x.shape[-1]) for x in inputs)
        total = int(sum(widths))
        kernel = self.param(
            "kernel", self.kernel_init, (total, self.features), self.param_dtype
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            inputs = tuple(x.astype(self.dtype) for x in inputs)
            if bias is not None:
                bias = bias.astype(self.dtype)
        splits = np.cumsum(widths)[:-1].tolist()
        kparts = jnp.split(kernel, splits, axis=0) if splits else [kernel]
        out = None
        for x, k in zip(inputs, kparts):
            part = jnp.matmul(x, k)
            out = part if out is None else out + part
        if bias is not None:
            out = out + bias
        return out


class MLP(nn.Module):
    """Plain MLP; variadic inputs are fused into the first layer.

    Parity: reference `ecnf/nets/mlp.py:7-19` (Dense per feature,
    activation between layers, optional final activation).
    """

    features: Sequence[int]
    activation: Callable = jax.nn.silu
    activate_final: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, *inputs: jax.Array) -> jax.Array:
        feats = tuple(self.features)
        x = ConcatDense(feats[0], dtype=self.dtype)(*inputs)
        if len(feats) > 1 or self.activate_final:
            x = self.activation(x)
        for i, f in enumerate(feats[1:]):
            is_last = i == len(feats) - 2
            x = nn.Dense(f, dtype=self.dtype)(x)
            if not is_last or self.activate_final:
                x = self.activation(x)
        return x


class NonLinearLayerWithResidualAndLayerNorm(nn.Module):
    """LayerNorm -> Dense -> activation, with residual.

    Parity: reference `ecnf/nets/mlp.py:22-29`.
    """

    output_size: int
    activation_fn: Callable = jax.nn.silu

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = self.activation_fn(nn.Dense(self.output_size)(nn.LayerNorm()(x)))
        return out + x


class StableMLP(nn.Module):
    """MLP with layer norm + residual blocks; optional zero-init or
    variance-scaled output layer.

    Parity: reference `ecnf/nets/mlp.py:32-72` (constant-width assertion,
    stable-layer structure, output-layer init options).  The first Dense is
    fused over variadic inputs like :class:`MLP`.
    """

    mlp_units: Sequence[int]
    activate_final: bool = False
    zero_init_output: bool = False
    output_variance_scaling: Optional[float] = None
    stable_layer: bool = True
    activation: Callable = jax.nn.silu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, *inputs: jax.Array) -> jax.Array:
        units = tuple(self.mlp_units)
        if not self.activate_final:
            assert len(units) > 1, "MLP is single linear layer with no non-linearity"
        activated_units = units if self.activate_final else units[:-1]
        for i in range(len(activated_units) - 1):
            assert activated_units[i] == activated_units[i + 1], "constant width required"
        if self.zero_init_output or self.output_variance_scaling:
            assert self.activate_final is False

        if self.stable_layer:
            x = self.activation(ConcatDense(activated_units[0], dtype=self.dtype)(*inputs))
            for width in activated_units[1:]:
                x = NonLinearLayerWithResidualAndLayerNorm(
                    width, activation_fn=self.activation
                )(x)
        else:
            x = MLP(
                activated_units,
                activate_final=True,
                activation=self.activation,
                dtype=self.dtype,
            )(*inputs)

        if not self.activate_final:
            if self.zero_init_output:
                kernel_init = nn.initializers.zeros_init()
            elif self.output_variance_scaling:
                kernel_init = nn.initializers.variance_scaling(
                    self.output_variance_scaling, "fan_avg", "uniform"
                )
            else:
                kernel_init = nn.linear.default_kernel_init
            x = nn.Dense(units[-1], kernel_init=kernel_init, dtype=self.dtype)(x)
        return x
