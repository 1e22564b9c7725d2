"""Per-point MLP blocks (functional params, no framework classes).

Equivalent of the reference's 1x1-conv MLP factory (networks/blocks.py:99-118
MLPConv1d): per-point dense layers, ReLU between, no norm and no bias on the
final layer. A 1x1 Conv1d over points IS a dense layer applied per point, so
on TPU we express it as a plain (N, C_in) @ (C_in, C_out) matmul.

Init distribution matches torch.nn.Conv1d defaults (kaiming_uniform with
a=sqrt(5) for weights, uniform(+-1/sqrt(fan_in)) for bias) so optimization
behaves like the reference; the RNG stream itself is jax.random.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_mlp(key, dims, last_bias: bool = False):
    """dims = (in, hidden..., out). Returns list of {"w": (in, out), "b": ...}.

    The final layer has no bias (reference blocks.py:111 use_bias=False on
    the last layer) unless `last_bias`.
    """
    layers = []
    for i in range(len(dims) - 1):
        fan_in, fan_out = dims[i], dims[i + 1]
        key, wk, bk = jax.random.split(key, 3)
        # kaiming_uniform(a=sqrt(5)) over fan_in: bound = sqrt(6/((1+5)*fan_in))
        bound_w = math.sqrt(6.0 / (6.0 * fan_in))
        w = jax.random.uniform(wk, (fan_in, fan_out), minval=-bound_w, maxval=bound_w)
        layer = {"w": w}
        is_last = i == len(dims) - 2
        if (not is_last) or last_bias:
            bound_b = 1.0 / math.sqrt(fan_in)
            layer["b"] = jax.random.uniform(bk, (fan_out,), minval=-bound_b, maxval=bound_b)
        layers.append(layer)
    return layers


def apply_mlp(layers, x: jnp.ndarray, activation=jax.nn.relu) -> jnp.ndarray:
    """x: (..., C_in) -> (..., C_out); ReLU between layers, none on the last."""
    n = len(layers)
    for i, layer in enumerate(layers):
        x = x @ layer["w"]
        if "b" in layer:
            x = x + layer["b"]
        if i < n - 1:
            x = activation(x)
    return x
