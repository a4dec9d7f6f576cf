"""Pallas TPU kernel for fused kernel-attention.

The hot op of the flagship model (SURVEY.md section 3.1 hot loop): given
pairwise distances, per-head lengthscales, a key mask, and values, compute

    scores = normalize(mask(basis(dists / ls)))      # [B, H, V, V]
    out    = scores @ values                         # [B, H, V, D]

The XLA path materializes the [B, H, V, V] score tensor in HBM once per
encoder layer (48 layers deep in the flagship). The Pallas kernel keeps the
per-(batch, head) score block in VMEM: one grid cell loads a [V, V] distance
tile + [V, D] values, computes basis/mask/normalize on the VPU, and hits the
MXU once for the AV product -- no score tensor ever reaches HBM.

Gradients: the kernel is wrapped in jax.custom_vjp whose backward re-derives
the op with the XLA reference implementation (recompute-in-backward), so the
fused forward is usable inside training too.
"""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_reference(dists, values, masked_elements, lengthscales, normalise=True):
    """Pure-XLA reference: [B,V,V], [B,V,H,D], [B,V], [H] -> [B,V,H,D]."""
    scaled = dists[:, None, :, :] / lengthscales[None, :, None, None]
    scores = jnp.exp(-(scaled**2))
    scores = jnp.where(masked_elements[:, None, None, :], 0.0, scores)
    if normalise:
        scores = scores / (jnp.abs(scores).sum(-1, keepdims=True) + 1e-5)
    return jnp.einsum("bhvw,bwhd->bvhd", scores, values)


def _attention_kernel(ls_ref, d_ref, v_ref, m_ref, o_ref, *, normalise: bool):
    """One (batch, head) grid cell.

    ls_ref: [H] lengthscales in SMEM (scalar-prefetch)
    d_ref:  [V, V] distances (VMEM)
    v_ref:  [V, D] values for this head (VMEM)
    m_ref:  [1, V] key mask as float (1.0 = padding) (VMEM)
    o_ref:  [V, D] output (VMEM)
    """
    h = pl.program_id(1)
    ls = ls_ref[h]
    scaled = d_ref[:] / ls
    scores = jnp.exp(-(scaled * scaled))  # [V, V]
    scores = scores * (1.0 - m_ref[0, :][None, :])
    if normalise:
        denom = jnp.abs(scores).sum(axis=-1, keepdims=True) + 1e-5
        scores = scores / denom
    o_ref[:] = jnp.dot(scores, v_ref[:], preferred_element_type=jnp.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_forward(dists, values, masked_elements, lengthscales, normalise=True):
    B, V_in, _ = dists.shape
    H, D_in = values.shape[2], values.shape[3]

    # Mosaic requires VMEM blocks aligned to the f32 (8, 128) tile: pad the
    # atom axis (lanes of the score block) and head dim to 128. Padded keys
    # enter the mask as padding (score 0); padded query rows/head lanes are
    # sliced off after the kernel. Molecules are small relative to the MXU,
    # so the hardware would idle below 128 lanes either way.
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

    mask_f = masked_elements.astype(jnp.float32)[:, None, :]  # [B, 1, V]
    # [B, V, H, D] -> [B, H, V, D] so one grid cell sees a contiguous [V, D].
    v_t = values.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, V, V), lambda b, h, ls: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V, D), lambda b, h, ls: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda b, h, ls: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, V, D), lambda b, h, ls: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(ls_ref, d_ref, v_ref, m_ref, o_ref):
        _attention_kernel(
            ls_ref,
            d_ref.at[0],
            v_ref.at[0, 0],
            m_ref.at[0],
            o_ref.at[0, 0],
            normalise=normalise,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, V, D), jnp.float32),
    )(lengthscales, dists, v_t, mask_f)
    return out.transpose(0, 2, 1, 3)[:, :V_in, :, :D_in]  # [B, V, H, D]


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


def _bwd(normalise, residuals, g):
    dists, values, masked_elements, lengthscales = residuals
    _, vjp = jax.vjp(
        lambda d, v, ls: xla_reference(d, v, masked_elements, ls, normalise),
        dists,
        values,
        lengthscales,
    )
    dd, dv, dls = vjp(g)
    return dd, dv, None, dls


fused_kernel_attention.defvjp(_fwd, _bwd)
