"""SE(3) data transformations (train-time augmentation + equivariance tests).

Reference: equivariance/equivariance_transforms.py:15-175 -- random rigid
rotation + translation applied to a batch; velocities and forces rotate like
vectors, only coordinates translate.
"""
import jax
import jax.numpy as jnp

from timewarp_tpu.data.batch import DenseBatch


def random_rotation_matrix(rng: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """Haar-uniform rotation in SO(3) from a random unit quaternion."""
    q = jax.random.normal(rng, (4,), dtype)
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=dtype,
    )


def random_rotation_matrices(rng: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jax.vmap(lambda k: random_rotation_matrix(k, dtype))(jax.random.split(rng, n))


def permute_batch(batch: DenseBatch, permutation) -> DenseBatch:
    """Permute the atom axis of every per-atom field (padding included) and
    remap the adjacency lists (reference:
    equivariance/equivariance_transforms.py Permutation). ``permutation`` is
    a [V] index array applied to every batch element."""
    perm = jnp.asarray(permutation)
    inv = jnp.argsort(perm)

    def p(x):
        return x[:, perm]

    adj = jnp.where(batch.adj_list >= 0, inv[jnp.clip(batch.adj_list, 0)], batch.adj_list)
    return batch.replace(
        atom_types=p(batch.atom_types),
        atom_coords=p(batch.atom_coords),
        atom_velocs=p(batch.atom_velocs),
        atom_forces=p(batch.atom_forces),
        atom_coord_targets=p(batch.atom_coord_targets),
        atom_veloc_targets=p(batch.atom_veloc_targets),
        atom_force_targets=p(batch.atom_force_targets),
        masked_elements=p(batch.masked_elements),
        adj_list=adj,
    )


def transform_batch(
    rng: jax.Array,
    batch: DenseBatch,
    rotate: bool = True,
    translate: bool = True,
    translation_scale: float = 1.0,
) -> DenseBatch:
    """Apply an independent random rigid transform to each batch element."""
    B = batch.atom_types.shape[0]
    k_rot, k_tr = jax.random.split(rng)
    R = (
        random_rotation_matrices(k_rot, B, batch.atom_coords.dtype)
        if rotate
        else jnp.tile(jnp.eye(3, dtype=batch.atom_coords.dtype), (B, 1, 1))
    )
    t = (
        translation_scale * jax.random.normal(k_tr, (B, 1, 3), batch.atom_coords.dtype)
        if translate
        else jnp.zeros((B, 1, 3), batch.atom_coords.dtype)
    )

    def rot(x):  # [B, V, 3] @ R^T
        # precision=highest: TPU einsum defaults to bf16 matmuls, which
        # quantizes coordinates by ~0.4% -- catastrophic for stiff bonded
        # energies (+50..200 kJ/mol per conformation).
        return jnp.einsum("bvj,bij->bvi", x, R, precision=jax.lax.Precision.HIGHEST)

    return batch.replace(
        atom_coords=rot(batch.atom_coords) + t,
        atom_velocs=rot(batch.atom_velocs),
        atom_forces=rot(batch.atom_forces),
        atom_coord_targets=rot(batch.atom_coord_targets) + t,
        atom_veloc_targets=rot(batch.atom_veloc_targets),
        atom_force_targets=rot(batch.atom_force_targets),
    )
