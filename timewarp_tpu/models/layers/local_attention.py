"""Radius-cutoff local self-attention.

Reference: modules/layers/local_self_attention.py:14-136 -- QKV projection,
pairwise distances, attend only to the K nearest neighbours inside
``max_radius`` (softmax over the neighbourhood, fully-masked rows zeroed).

TPU-first change: the reference picks K = max neighbour count *dynamically*
per batch (local_self_attention.py:77), which is a dynamic shape and cannot
jit. Here K (``max_neighbors``) is a static config bound; neighbours beyond
the radius are masked and, if a molecule is denser than K, attention
truncates to the K nearest (a controlled approximation that the radius is
meant to bound anyway).
"""
import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

BIG = 1e9


@dataclasses.dataclass
class LocalAttentionConfig:
    num_heads: int
    max_radius: float
    max_neighbors: int = 32  # static K; clipped to V at call time


class LocalSelfAttention(nn.Module):
    config: LocalAttentionConfig
    d_model: int

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, V, d_model]
        dists: jnp.ndarray,  # [B, V, V] precomputed pairwise distances
        masked_elements: jnp.ndarray,  # [B, V] bool, True = padding
    ) -> jnp.ndarray:
        cfg = self.config
        B, V, _ = src.shape
        H = cfg.num_heads
        dk = self.d_model  # per-head key/query/value dim, matching reference

        qkv = nn.Dense(H * 3 * dk, use_bias=False, name="qkv")(src)
        qkv = qkv.reshape(B, V, H, 3 * dk)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [B, V, H, dk]

        # Padded atoms are infinitely far so they never become neighbours.
        pad = masked_elements[:, None, :] | masked_elements[:, :, None]
        d = jnp.where(pad, BIG, dists)  # [B, V, V]

        K = min(cfg.max_neighbors, V)
        neg_topk = jax.lax.top_k(-d, K)  # nearest K
        nbr_dist = -neg_topk[0]  # [B, V, K]
        nbr_idx = neg_topk[1]  # [B, V, K]
        nbr_mask = nbr_dist > cfg.max_radius  # True = not a real neighbour

        k_local = jnp.take_along_axis(k[:, None], nbr_idx[..., None, None], axis=2)
        # k[:, None]: [B, 1, V, H, dk], idx: [B, V, K, 1, 1] -> [B, V, K, H, dk]
        v_local = jnp.take_along_axis(v[:, None], nbr_idx[..., None, None], axis=2)

        scores = (k_local * q[:, :, None]).sum(-1) / jnp.sqrt(
            jnp.asarray(dk, src.dtype)
        )  # [B, V, K, H]
        scores = jnp.where(nbr_mask[..., None], -BIG, scores)
        weights = nn.softmax(scores, axis=-2)
        weights = jnp.where(nbr_mask[..., None], 0.0, weights)

        out = (weights[..., None] * v_local).sum(axis=2)  # [B, V, H, dk]
        out = out.reshape(B, V, H * dk)
        return nn.Dense(self.d_model, use_bias=False, name="out")(out)
