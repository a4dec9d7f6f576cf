"""Pointwise SiLU MLP (reference: modules/layers/mlp.py:6-26)."""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for h in self.hidden_dims:
            x = nn.silu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)
