"""Local (radius-cutoff) self-attention unit tests, mirroring the
reference's gather test (reference: tests/test_local_attention.py:7) plus
boundary pins for the TPU-first static-K redesign: when a molecule has more
in-radius atoms than K, attention truncates to the K nearest -- behaviour
the reference never hits (it sizes K dynamically), so it is pinned here."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.models.layers.local_attention import (
    LocalAttentionConfig,
    LocalSelfAttention,
)


def _setup(V, K, max_radius, d_model=6, H=2, seed=0):
    cfg = LocalAttentionConfig(num_heads=H, max_radius=max_radius, max_neighbors=K)
    mod = LocalSelfAttention(config=cfg, d_model=d_model)
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.normal(size=(1, V, d_model)).astype(np.float32))
    pos = rng.normal(size=(1, V, 3)).astype(np.float32)
    dists = jnp.asarray(np.linalg.norm(pos[:, :, None] - pos[:, None], axis=-1))
    mask = jnp.zeros((1, V), bool)
    params = mod.init(jax.random.PRNGKey(seed), src, dists, mask)
    return mod, params, src, dists, mask


def _manual(mod, params, src, dists, mask, neighbor_fn):
    """Dense-matrix local attention: softmax over an explicit [V, V]
    allow-matrix produced by ``neighbor_fn(d_row) -> bool allowed``."""
    cfg = mod.config
    d_model = mod.d_model
    H = cfg.num_heads
    W_qkv = np.asarray(params["params"]["qkv"]["kernel"])
    W_out = np.asarray(params["params"]["out"]["kernel"])
    x = np.asarray(src[0])
    V = x.shape[0]
    qkv = (x @ W_qkv).reshape(V, H, 3 * d_model)
    q, k, v = np.split(qkv, 3, axis=-1)
    d = np.asarray(dists[0])
    out = np.zeros((V, H, d_model))
    for i in range(V):
        allowed = neighbor_fn(d[i], i)
        scores = (k[allowed] * q[i]).sum(-1) / np.sqrt(d_model)  # [n, H]
        w = np.exp(scores - scores.max(0))
        w = w / w.sum(0)
        out[i] = (w[..., None] * v[allowed]).sum(0)
    return out.reshape(V, H * d_model) @ W_out


def test_equals_full_attention_when_k_covers_all():
    """K >= V and an infinite radius degenerate to ordinary attention."""
    V = 5
    mod, params, src, dists, mask = _setup(V=V, K=8, max_radius=1e6)
    got = np.asarray(mod.apply(params, src, dists, mask))[0]
    want = _manual(mod, params, src, dists, mask, lambda d_row, i: np.ones(V, bool))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_radius_restricts_neighbours():
    """Only atoms inside max_radius attend (K loose enough not to bind)."""
    radius = 1.2
    mod, params, src, dists, mask = _setup(V=6, K=6, max_radius=radius)
    got = np.asarray(mod.apply(params, src, dists, mask))[0]
    want = _manual(mod, params, src, dists, mask, lambda d_row, i: d_row <= radius)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_truncation_to_k_nearest_when_denser_than_k():
    """The boundary the static-K redesign introduces: a molecule with more
    in-radius atoms than K attends to exactly the K nearest."""
    V, K = 8, 4
    mod, params, src, dists, mask = _setup(V=V, K=K, max_radius=1e6)
    got = np.asarray(mod.apply(params, src, dists, mask))[0]

    def k_nearest(d_row, i):
        allowed = np.zeros(V, bool)
        allowed[np.argsort(d_row)[:K]] = True
        return allowed

    want = _manual(mod, params, src, dists, mask, k_nearest)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_padding_never_neighbours():
    """Padded atoms are excluded from every neighbourhood: the output on
    real atoms is identical with and without extra padded rows."""
    V = 5
    mod, params, src, dists, mask = _setup(V=V, K=4, max_radius=1e6)
    out_ref = np.asarray(mod.apply(params, src, dists, mask))[0]

    # Append two padded atoms at distance ~0 from everything (worst case:
    # they would be the nearest neighbours if the mask failed).
    Vp = V + 2
    src_p = jnp.concatenate([src, jnp.ones((1, 2, src.shape[-1]))], axis=1)
    d = np.zeros((1, Vp, Vp), np.float32)
    d[:, :V, :V] = np.asarray(dists)
    mask_p = jnp.asarray(np.arange(Vp)[None] >= V)
    out_pad = np.asarray(mod.apply(params, src_p, jnp.asarray(d), mask_p))[0]
    np.testing.assert_allclose(out_pad[:V], out_ref, rtol=1e-4, atol=1e-5)
