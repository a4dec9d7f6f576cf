"""Pallas TPU kernels for fused kernel-attention.

The hot op of the flagship model (SURVEY.md section 3.1 hot loop): given
pairwise distances, per-head lengthscales, a key mask, and values, compute

    scores = normalize(mask(basis(dists / ls)))      # [B, H, V, V]
    out    = scores @ values                         # [B, H, V, D]

The XLA path materializes the [B, H, V, V] score tensor in HBM once per
encoder layer (48 layer applications deep in the flagship). The Pallas
kernels keep score blocks in VMEM only:

- Forward: grid (B, H, Q-blocks). One cell loads a [TQ, V] distance tile +
  this head's [V, D] values, computes basis/mask/normalize on the VPU and
  one MXU matmul for the AV product. Tiling the query axis bounds VMEM at
  O(TQ*V + V*D), so T1-scale molecules (V up to ~2000) fit.
- Backward (Gaussian basis): grid (B, Q-blocks), heads unrolled in-kernel.
  Recomputes the score tile from the distance tile (cheap VPU work), then
  produces d_dists tiles, accumulated d_values, and per-head lengthscale
  gradients without ever materializing [B, H, V, V] in HBM. The Chebyshev
  basis keeps the XLA recompute backward (its coefficient gradients need a
  second recursion; the forward is still fused).

Bases: Gaussian exp(-(d/ls)^2) and the Chebyshev-rational expansion of
exp(-x) (reference: modules/layers/kernel_attention.py:292-331).

Measured on one v5e chip (round 2): isolated-op forward is at parity with
the XLA path at MXU-sized shapes (V=512 B=32: 2.73 vs 2.70 ms; V=1024 B=8:
1.49 vs 1.41). BUT end-to-end the kernel LOSES badly on small molecules:
it pads V up to a multiple of 128 (a 22-atom dipeptide does ~28x the
arithmetic) and breaks XLA's fusion of the surrounding elementwise ops --
the round-2 A/B on the real chip measured 18,782 proposals/s (XLA) vs
5,312 (Pallas) on the AD-1 MH loop. Hence the shape gate in
models/layers/kernel_attention.py (PALLAS_MIN_V): the fused kernel is for
T1-scale molecules (V >~ 256), where its wins are (a) never holding
[B,H,V,V] score tensors in HBM and (b) in-kernel fusion headroom.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # query-block tile (f32 sublane-friendly, multiple of 8)


def xla_reference(
    dists, values, masked_elements, lengthscales, normalise=True, cheb_coeffs=None,
    force_asymptotic_zero=False,
):
    """Pure-XLA reference: [B,V,V], [B,V,H,D], [B,V], [H] -> [B,V,H,D]."""
    from timewarp_tpu.models.layers.kernel_attention import kernel_attention_scores

    scores = kernel_attention_scores(
        dists, masked_elements, lengthscales, normalise=normalise,
        cheb_coeffs=cheb_coeffs, force_asymptotic_zero=force_asymptotic_zero,
    )
    return jnp.einsum("bhvw,bwhd->bvhd", scores, values)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cheb_scores(x, coeffs_row):
    """Chebyshev-rational expansion sum_c a_c T_c((x-1)/(x+1)) with the
    coefficients already centered if force_asymptotic_zero; ``coeffs_row``
    is a python list of scalars (read from SMEM), so the recursion unrolls."""
    r = (x - 1.0) / (x + 1.0)
    order = len(coeffs_row)
    acc = coeffs_row[0] * jnp.ones_like(x)
    if order >= 2:
        acc = acc + coeffs_row[1] * r
    prev, cur = jnp.ones_like(x), r
    for c in range(2, order):
        nxt = 2.0 * r * cur - prev
        acc = acc + coeffs_row[c] * nxt
        prev, cur = cur, nxt
    return acc


def _pad_inputs(dists, values, masked_elements):
    B, V_in, _ = dists.shape
    D_in = values.shape[3]
    V = _round_up(V_in, 128)
    D = _round_up(D_in, 128)
    if V != V_in:
        pad = V - V_in
        dists = jnp.pad(dists, ((0, 0), (0, pad), (0, pad)))
        values = jnp.pad(values, ((0, 0), (0, pad), (0, 0), (0, 0)))
        masked_elements = jnp.pad(
            masked_elements, ((0, 0), (0, pad)), constant_values=True
        )
    if D != D_in:
        values = jnp.pad(values, ((0, 0), (0, 0), (0, 0), (0, D - D_in)))
    return dists, values, masked_elements, V, D


def _fused_forward(
    dists, values, masked_elements, lengthscales, normalise=True, cheb=None,
):
    """cheb: None for the Gaussian basis, or a [H, order] coefficient array
    (already centered when force_asymptotic_zero)."""
    B, V_in, _ = dists.shape
    H, D_in = values.shape[2], values.shape[3]
    dists, values, masked_elements, V, D = _pad_inputs(dists, values, masked_elements)
    nq = V // TQ

    mask_f = masked_elements.astype(jnp.float32)[:, None, :]  # [B, 1, V]
    v_t = values.transpose(0, 2, 1, 3)  # [B, H, V, D]

    num_prefetch = 1 if cheb is None else 2
    order = 0 if cheb is None else cheb.shape[1]

    def kernel(*refs):
        if cheb is None:
            ls_ref, d_ref, v_ref, m_ref, o_ref = refs
            coeffs_ref = None
        else:
            ls_ref, coeffs_ref, d_ref, v_ref, m_ref, o_ref = refs
        h = pl.program_id(1)
        scaled = d_ref[0] / ls_ref[h]
        x = scaled * scaled
        if cheb is None:
            scores = jnp.exp(-x)
        else:
            row = [coeffs_ref[h, c] for c in range(order)]
            scores = _cheb_scores(x, row)
        scores = scores * (1.0 - m_ref[0, 0, :][None, :])
        if normalise:
            denom = jnp.abs(scores).sum(axis=-1, keepdims=True) + 1e-5
            scores = scores / denom
        o_ref[0, 0] = jnp.dot(
            scores, v_ref[0, 0], preferred_element_type=jnp.float32
        )

    in_specs = [
        pl.BlockSpec((1, TQ, V), lambda b, h, q, *_: (b, q, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, V, D), lambda b, h, q, *_: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, V), lambda b, h, q, *_: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(B, H, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TQ, D), lambda b, h, q, *_: (b, h, q, 0), memory_space=pltpu.VMEM
        ),
    )
    args = (lengthscales,) if cheb is None else (lengthscales, cheb)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, V, D), jnp.float32),
    )(*args, dists, v_t, mask_f)
    return out.transpose(0, 2, 1, 3)[:, :V_in, :, :D_in]  # [B, V, H, D]


def _fused_backward_gaussian(
    dists, values, masked_elements, lengthscales, normalise, g
):
    """Fused VJP for the Gaussian basis.

    Returns (d_dists [B,V,V], d_values [B,V,H,D], d_lengthscales [H]).
    Grid (B, Q-blocks) with the head loop unrolled in-kernel so d_values and
    d_lengthscales accumulate across the innermost (Q) grid dimension.
    """
    B, V_in, _ = dists.shape
    H, D_in = values.shape[2], values.shape[3]
    dists, values, masked_elements, V, D = _pad_inputs(dists, values, masked_elements)
    g = jnp.pad(g, ((0, 0), (0, V - V_in), (0, 0), (0, D - D_in)))
    nq = V // TQ

    mask_f = masked_elements.astype(jnp.float32)[:, None, :]
    v_t = values.transpose(0, 2, 1, 3)  # [B, H, V, D]
    g_t = g.transpose(0, 2, 1, 3)  # [B, H, V, D]

    def kernel(ls_ref, d_ref, v_ref, g_ref, m_ref, dd_ref, dv_ref, dls_ref):
        q = pl.program_id(1)

        @pl.when(q == 0)
        def _init():
            dv_ref[...] = jnp.zeros_like(dv_ref)
            dls_ref[...] = jnp.zeros_like(dls_ref)

        d = d_ref[0]  # [TQ, V]
        keymask = 1.0 - m_ref[0, 0, :][None, :]  # [1 -> TQ, V]
        dd_acc = jnp.zeros_like(d)
        for h in range(H):
            ls = ls_ref[h]
            scaled = d / ls
            s = jnp.exp(-(scaled * scaled)) * keymask  # [TQ, V]
            gh = g_ref[0, h]  # [TQ, D]
            vh = v_ref[0, h]  # [V, D]
            ds_n = jnp.dot(gh, vh.T, preferred_element_type=jnp.float32)  # [TQ, V]
            if normalise:
                denom = s.sum(axis=-1, keepdims=True) + 1e-5  # s >= 0
                s_n = s / denom
                ds = (ds_n - (ds_n * s_n).sum(-1, keepdims=True)) / denom
            else:
                s_n = s
                ds = ds_n
            # d_values[h] += s_n^T @ g
            dv_ref[0, h] += jnp.dot(s_n.T, gh, preferred_element_type=jnp.float32)
            # dS/dd = s * (-2 d / ls^2); masked keys have s = 0.
            ds_s = ds * s
            dd_acc = dd_acc + ds_s * (-2.0 * d / (ls * ls))
            # dS/dls = s * 2 d^2 / ls^3. The scalar lands in lane h of an
            # (8, 128) accumulator tile (a [1, H] output violates the TPU
            # (8, 128) block-tiling rule in both VMEM and SMEM).
            dls_h = (ds_s * (2.0 * d * d)).sum() / (ls * ls * ls)
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            onehot = ((lane == h) & (sub == 0)).astype(jnp.float32)
            dls_ref[0] += dls_h * onehot
        dd_ref[0] = dd_acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, TQ, V), lambda b, q, *_: (b, q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, V, D), lambda b, q, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, TQ, D), lambda b, q, *_: (b, 0, q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda b, q, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, V), lambda b, q, *_: (b, q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, V, D), lambda b, q, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, q, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    dd, dv, dls_part = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, V, V), jnp.float32),
            jax.ShapeDtypeStruct((B, H, V, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        ],
    )(lengthscales, dists, v_t, g_t, mask_f)
    dd = dd[:, :V_in, :V_in]
    dv = dv.transpose(0, 2, 1, 3)[:, :V_in, :, :D_in]
    return dd, dv, dls_part[:, 0, :H].sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_kernel_attention(dists, values, masked_elements, lengthscales, normalise=True):
    """Fused Gaussian-basis kernel attention (see module docstring).

    dists [B,V,V] f32, values [B,V,H,D] f32, masked_elements [B,V] bool,
    lengthscales [H] f32 -> [B,V,H,D] f32.
    """
    return _fused_forward(dists, values, masked_elements, lengthscales, normalise)


def _fwd(dists, values, masked_elements, lengthscales, normalise):
    out = _fused_forward(dists, values, masked_elements, lengthscales, normalise)
    return out, (dists, values, masked_elements, lengthscales)


# Above this atom count the fused backward's whole-V value/grad blocks
# exceed VMEM (measured: V=1024, H=6, D=128 requests ~21 MB); fall back to
# the XLA recompute backward there (still one fused forward).
_BWD_V_LIMIT = 768


def _bwd(normalise, residuals, g):
    dists, values, masked_elements, lengthscales = residuals
    if dists.shape[1] > _BWD_V_LIMIT:
        _, vjp = jax.vjp(
            lambda d, v, ls: xla_reference(d, v, masked_elements, ls, normalise),
            dists, values, lengthscales,
        )
        dd, dv, dls = vjp(g)
        return dd, dv, None, dls
    dd, dv, dls = _fused_backward_gaussian(
        dists, values, masked_elements, lengthscales, normalise, g
    )
    return dd, dv, None, dls


fused_kernel_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_chebyshev_attention(
    dists, values, masked_elements, lengthscales, cheb_coeffs, normalise=True
):
    """Fused Chebyshev-rational kernel attention. ``cheb_coeffs`` [H, order]
    must already be centered when force_asymptotic_zero applies. The forward
    runs in Pallas; the backward recomputes through the XLA reference (the
    coefficient gradient needs a derivative recursion not worth fusing at
    current model sizes)."""
    return _fused_forward(
        dists, values, masked_elements, lengthscales, normalise, cheb=cheb_coeffs
    )


def _cheb_fwd(dists, values, masked_elements, lengthscales, cheb_coeffs, normalise):
    out = _fused_forward(
        dists, values, masked_elements, lengthscales, normalise, cheb=cheb_coeffs
    )
    return out, (dists, values, masked_elements, lengthscales, cheb_coeffs)


def _cheb_bwd(normalise, residuals, g):
    dists, values, masked_elements, lengthscales, cheb_coeffs = residuals
    _, vjp = jax.vjp(
        lambda d, v, ls, cc: xla_reference(
            d, v, masked_elements, ls, normalise, cheb_coeffs=cc
        ),
        dists,
        values,
        lengthscales,
        cheb_coeffs,
    )
    dd, dv, dls, dcc = vjp(g)
    return dd, dv, None, dls, dcc


fused_chebyshev_attention.defvjp(_cheb_fwd, _cheb_bwd)
