"""Batch pytrees and dense collation.

TPU-first counterpart of the reference's ``DenseMolDynBatch``
(reference: dataloader.py:109-196, moldyn_dense_collate_fn at :328-400).

Differences from the torch version, by design:

- ``DenseBatch`` is a JAX pytree (``flax.struct.dataclass``), so it can be
  passed straight through ``jax.jit`` / ``shard_map`` without unpack/repack.
  Host-side metadata (``names``) is a non-pytree field.
- Padding is *bucketed*: the max atom count of a batch is rounded up to a
  configurable multiple (default 8, TPU sublane) so XLA sees few distinct
  shapes and the compilation cache stays small.
- The adjacency list is stored densely per batch element ``[B, E_max, 2]``
  with an edge mask, instead of the reference's flat ``[E, 2]`` + edge batch
  index -- ragged arrays don't jit.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def contiguous_segments(names: Sequence[str]) -> List[int]:
    """Longest contiguous runs of equal names: ``names[seg[i]:seg[i+1]]`` is
    constant. Used to batch energy evaluations per molecule
    (reference: dataloader.py:28-42)."""
    segments = [0]
    for i, name in enumerate(names):
        if name != names[segments[-1]]:
            segments.append(i)
    segments.append(len(names))
    return segments


@dataclasses.dataclass
class MolDynDatapoint:
    """One (x, y) training pair for a molecule (reference: dataloader.py:58-74).

    All arrays are host-side numpy; conversion to device arrays happens at
    collation time.
    """

    name: str
    atom_types: np.ndarray  # [V] int32
    adj_list: np.ndarray  # [E, 2] int32
    atom_coords: np.ndarray  # [V, 3] float32
    atom_velocs: np.ndarray  # [V, 3] float32
    atom_forces: np.ndarray  # [V, 3] float32
    atom_coord_targets: np.ndarray  # [V, 3] float32
    atom_veloc_targets: np.ndarray  # [V, 3] float32
    atom_force_targets: np.ndarray  # [V, 3] float32

    @property
    def num_atoms(self) -> int:
        return int(self.atom_types.shape[0])


@struct.dataclass
class DenseBatch:
    """A padded dense batch. True in ``masked_elements`` marks padding.

    Pytree leaves are jnp arrays of static shapes; ``names`` rides along as
    static metadata (pytree_node=False) -- it's only used host-side for
    energy-segment bookkeeping and logging.
    """

    atom_types: jnp.ndarray  # [B, V] int32
    atom_coords: jnp.ndarray  # [B, V, 3] f32
    atom_velocs: jnp.ndarray  # [B, V, 3] f32
    atom_forces: jnp.ndarray  # [B, V, 3] f32
    atom_coord_targets: jnp.ndarray  # [B, V, 3] f32
    atom_veloc_targets: jnp.ndarray  # [B, V, 3] f32
    atom_force_targets: jnp.ndarray  # [B, V, 3] f32
    masked_elements: jnp.ndarray  # [B, V] bool; True = padding
    adj_list: jnp.ndarray  # [B, E, 2] int32 (padded with -1)
    adj_mask: jnp.ndarray  # [B, E] bool; True = real edge
    names: Tuple[str, ...] = struct.field(pytree_node=False, default=())

    @property
    def batch_size(self) -> int:
        return self.atom_types.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.atom_types.shape[1]

    @property
    def num_atoms(self) -> jnp.ndarray:  # [B]
        return (~self.masked_elements).sum(axis=1)

    @property
    def segments(self) -> List[int]:
        return contiguous_segments(self.names)

    def sort_by_name(self) -> "DenseBatch":
        perm = np.argsort(np.asarray(self.names, dtype=object))
        return self.permute(perm)

    def permute(self, permutation) -> "DenseBatch":
        perm = jnp.asarray(np.asarray(permutation))
        names = tuple(self.names[int(i)] for i in np.asarray(permutation))
        return self.replace(
            atom_types=self.atom_types[perm],
            atom_coords=self.atom_coords[perm],
            atom_velocs=self.atom_velocs[perm],
            atom_forces=self.atom_forces[perm],
            atom_coord_targets=self.atom_coord_targets[perm],
            atom_veloc_targets=self.atom_veloc_targets[perm],
            atom_force_targets=self.atom_force_targets[perm],
            masked_elements=self.masked_elements[perm],
            adj_list=self.adj_list[perm],
            adj_mask=self.adj_mask[perm],
            names=names,
        )

    def __getitem__(self, idx) -> "DenseBatch":
        """Select a sub-batch: ``batch[i]`` (singleton) or ``batch[a:b]``."""
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        names = tuple(self.names[idx]) if self.names else ()
        return self.replace(
            atom_types=self.atom_types[idx],
            atom_coords=self.atom_coords[idx],
            atom_velocs=self.atom_velocs[idx],
            atom_forces=self.atom_forces[idx],
            atom_coord_targets=self.atom_coord_targets[idx],
            atom_veloc_targets=self.atom_veloc_targets[idx],
            atom_force_targets=self.atom_force_targets[idx],
            masked_elements=self.masked_elements[idx],
            adj_list=self.adj_list[idx],
            adj_mask=self.adj_mask[idx],
            names=names,
        )


def lengths_to_mask(lengths: np.ndarray, max_len: Optional[int] = None) -> np.ndarray:
    """[B] lengths -> [B, max_len] bool mask; True where index >= length
    (i.e. padding). Reference: dataloader.py:403-417."""
    lengths = np.asarray(lengths)
    if max_len is None:
        max_len = int(lengths.max())
    return np.arange(max_len)[None, :] >= lengths[:, None]


def _pad_stack(arrays: Sequence[np.ndarray], max_len: int, fill=0.0) -> np.ndarray:
    if fill == 0.0:
        # Native C++ path: one call pads the whole field with no per-row
        # Python work (timewarp_tpu/native/collate_ext.cc); falls back to
        # numpy inside when the toolchain is unavailable.
        from timewarp_tpu.data.native_collate import pad_stack as _native_pad

        return _native_pad(arrays, max_len)
    out_shape = (len(arrays), max_len) + tuple(arrays[0].shape[1:])
    out = np.full(out_shape, fill, dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out


def collate_dense(
    datapoints: Sequence[MolDynDatapoint],
    pad_multiple: int = 8,
    max_atoms: Optional[int] = None,
    max_edges: Optional[int] = None,
) -> DenseBatch:
    """Pad a list of datapoints into one DenseBatch.

    ``pad_multiple`` buckets the padded atom count so XLA recompiles rarely.
    Explicit ``max_atoms`` / ``max_edges`` pin the shape (e.g. one bucket for
    a whole single-molecule dataset).
    """
    lengths = np.array([d.num_atoms for d in datapoints], dtype=np.int64)
    v_max = max_atoms if max_atoms is not None else round_up(int(lengths.max()), pad_multiple)
    assert v_max >= lengths.max(), "max_atoms smaller than largest molecule"

    e_lengths = np.array([d.adj_list.shape[0] for d in datapoints], dtype=np.int64)
    e_max = max_edges if max_edges is not None else round_up(max(int(e_lengths.max()), 1), pad_multiple)

    batch = DenseBatch(
        atom_types=jnp.asarray(_pad_stack([d.atom_types for d in datapoints], v_max)),
        atom_coords=jnp.asarray(_pad_stack([d.atom_coords for d in datapoints], v_max)),
        atom_velocs=jnp.asarray(_pad_stack([d.atom_velocs for d in datapoints], v_max)),
        atom_forces=jnp.asarray(_pad_stack([d.atom_forces for d in datapoints], v_max)),
        atom_coord_targets=jnp.asarray(
            _pad_stack([d.atom_coord_targets for d in datapoints], v_max)
        ),
        atom_veloc_targets=jnp.asarray(
            _pad_stack([d.atom_veloc_targets for d in datapoints], v_max)
        ),
        atom_force_targets=jnp.asarray(
            _pad_stack([d.atom_force_targets for d in datapoints], v_max)
        ),
        masked_elements=jnp.asarray(lengths_to_mask(lengths, v_max)),
        adj_list=jnp.asarray(_pad_stack([d.adj_list for d in datapoints], e_max, fill=-1)),
        adj_mask=jnp.asarray(~lengths_to_mask(e_lengths, e_max)),
        names=tuple(d.name for d in datapoints),
    )
    return batch


@struct.dataclass
class SparseBatch:
    """One-big-graph collation (reference: SparseMolDynBatch,
    dataloader.py:77-106 + moldyn_sparse_collate_fn :279-326).

    All molecules are concatenated along one node axis with per-node segment
    ids, the GNN-friendly layout. Unlike the torch version, the node/edge
    axes are padded to static budgets (``node_mask`` / ``adj_mask``) so the
    batch jits -- the jraph-style padding idiom. Per-graph reductions are
    ``jax.ops.segment_sum``-style with ``num_segments = num_graphs``.
    """

    atom_types: jnp.ndarray  # [N] int32
    atom_coords: jnp.ndarray  # [N, 3] f32
    atom_velocs: jnp.ndarray  # [N, 3] f32
    atom_forces: jnp.ndarray  # [N, 3] f32
    atom_coord_targets: jnp.ndarray  # [N, 3] f32
    atom_veloc_targets: jnp.ndarray  # [N, 3] f32
    atom_force_targets: jnp.ndarray  # [N, 3] f32
    atom_to_sample_id: jnp.ndarray  # [N] int32; padding nodes -> num_graphs
    node_mask: jnp.ndarray  # [N] bool; True = real node
    adj_list: jnp.ndarray  # [E, 2] int32, node ids offset per graph; pad -1
    adj_mask: jnp.ndarray  # [E] bool; True = real edge
    names: Tuple[str, ...] = struct.field(pytree_node=False, default=())

    @property
    def num_graphs(self) -> int:
        return len(self.names)

    @property
    def num_nodes(self) -> jnp.ndarray:
        return self.node_mask.sum()

    def per_graph_sum(self, node_values: jnp.ndarray) -> jnp.ndarray:
        """Segment-reduce node values to per-graph values, [N, ...] ->
        [num_graphs, ...] (padding nodes fall into an extra dropped bin)."""
        import jax

        out = jax.ops.segment_sum(
            node_values, self.atom_to_sample_id, num_segments=self.num_graphs + 1
        )
        return out[: self.num_graphs]


def collate_sparse(
    datapoints: Sequence[MolDynDatapoint],
    pad_multiple: int = 8,
    max_nodes: Optional[int] = None,
    max_edges: Optional[int] = None,
) -> SparseBatch:
    """Concatenate datapoints into one big graph with static padding.

    Node ids in ``adj_list`` are offset by each molecule's start position
    (reference: moldyn_sparse_collate_fn, dataloader.py:299-303). Padding
    nodes carry ``atom_to_sample_id == num_graphs`` so segment reductions
    over ``num_graphs`` bins drop them.
    """
    n_real = int(sum(d.num_atoms for d in datapoints))
    e_real = int(sum(d.adj_list.shape[0] for d in datapoints))
    n_tot = max_nodes if max_nodes is not None else round_up(n_real, pad_multiple)
    e_tot = max_edges if max_edges is not None else round_up(max(e_real, 1), pad_multiple)
    assert n_tot >= n_real and e_tot >= e_real, "padding budget too small"

    def cat_pad(pieces, total, fill=0.0):
        flat = np.concatenate(pieces, axis=0)
        out_shape = (total,) + flat.shape[1:]
        out = np.full(out_shape, fill, dtype=flat.dtype)
        out[: flat.shape[0]] = flat
        return out

    offsets = np.cumsum([0] + [d.num_atoms for d in datapoints])
    sample_ids = np.concatenate(
        [np.full(d.num_atoms, i, np.int32) for i, d in enumerate(datapoints)]
    )
    adj = [d.adj_list + offsets[i] for i, d in enumerate(datapoints)]
    return SparseBatch(
        atom_types=jnp.asarray(cat_pad([d.atom_types for d in datapoints], n_tot)),
        atom_coords=jnp.asarray(cat_pad([d.atom_coords for d in datapoints], n_tot)),
        atom_velocs=jnp.asarray(cat_pad([d.atom_velocs for d in datapoints], n_tot)),
        atom_forces=jnp.asarray(cat_pad([d.atom_forces for d in datapoints], n_tot)),
        atom_coord_targets=jnp.asarray(
            cat_pad([d.atom_coord_targets for d in datapoints], n_tot)
        ),
        atom_veloc_targets=jnp.asarray(
            cat_pad([d.atom_veloc_targets for d in datapoints], n_tot)
        ),
        atom_force_targets=jnp.asarray(
            cat_pad([d.atom_force_targets for d in datapoints], n_tot)
        ),
        atom_to_sample_id=jnp.asarray(cat_pad([sample_ids], n_tot, fill=len(datapoints))),
        node_mask=jnp.asarray(np.arange(n_tot) < n_real),
        adj_list=jnp.asarray(cat_pad(adj, e_tot, fill=-1)),
        adj_mask=jnp.asarray(np.arange(e_tot) < e_real),
        names=tuple(d.name for d in datapoints),
    )


def dense_to_sparse(batch: DenseBatch) -> SparseBatch:
    """Re-collate a DenseBatch as a SparseBatch (host-side)."""
    points = []
    types = np.asarray(batch.atom_types)
    mask = np.asarray(batch.masked_elements)
    adj = np.asarray(batch.adj_list)
    adj_mask = np.asarray(batch.adj_mask)
    arrays = {
        f: np.asarray(getattr(batch, f))
        for f in (
            "atom_coords", "atom_velocs", "atom_forces",
            "atom_coord_targets", "atom_veloc_targets", "atom_force_targets",
        )
    }
    for b in range(batch.batch_size):
        n = int((~mask[b]).sum())
        # collate_dense always places real atoms as a contiguous prefix; any
        # other layout would silently pull padding rows into the molecule.
        if mask[b, :n].any():
            raise ValueError(
                f"row {b}: real atoms are not a contiguous prefix of the mask"
            )
        points.append(
            MolDynDatapoint(
                name=batch.names[b] if batch.names else str(b),
                atom_types=types[b, :n],
                adj_list=adj[b][adj_mask[b]],
                **{f: a[b, :n] for f, a in arrays.items()},
            )
        )
    return collate_sparse(points)
