import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.batch import (
    collate_dense,
    contiguous_segments,
    lengths_to_mask,
)
from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.data.trajectory import infer_spacing, load_trajectory_pairs


def test_lengths_to_mask():
    mask = lengths_to_mask(np.array([2, 3]))
    assert mask.shape == (2, 3)
    assert mask.tolist() == [[False, False, True], [False, False, False]]


def test_contiguous_segments():
    assert contiguous_segments(["a", "a", "b", "b", "b", "c"]) == [0, 2, 5, 6]
    assert contiguous_segments([]) == [0, 0]


def test_collate_dense_padding(dummy_datapoints):
    batch = collate_dense(dummy_datapoints, pad_multiple=8)
    assert batch.atom_types.shape == (2, 8)
    assert batch.masked_elements.shape == (2, 8)
    # mol3 has 3 atoms: 5 padded entries.
    assert int(batch.masked_elements[0].sum()) == 5
    assert int(batch.masked_elements[1].sum()) == 3
    np.testing.assert_allclose(
        np.asarray(batch.atom_coords[0, :3]), dummy_datapoints[0].atom_coords
    )
    # Padded coords are zero.
    assert np.all(np.asarray(batch.atom_coords[0, 3:]) == 0)
    assert batch.names == ("mol3", "mol5")
    assert batch.num_atoms.tolist() == [3, 5]


def test_collate_permute_and_segments(dummy_datapoints):
    batch = collate_dense(dummy_datapoints * 2)  # names: m3, m5, m3, m5
    sorted_batch = batch.sort_by_name()
    assert sorted_batch.names == ("mol3", "mol3", "mol5", "mol5")
    assert sorted_batch.segments == [0, 2, 4]
    # Data moved with the permutation.
    np.testing.assert_allclose(
        np.asarray(sorted_batch.atom_coords[1, :3]),
        dummy_datapoints[0].atom_coords,
    )


def test_getitem(dummy_datapoints):
    batch = collate_dense(dummy_datapoints)
    single = batch[1]
    assert single.batch_size == 1
    assert single.names == ("mol5",)


def test_parse_pdb_2olx(testdata_2olx):
    state0, _ = testdata_2olx
    topo = parse_pdb(state0)
    assert topo.num_atoms == 65
    assert len(topo.residues) == 4
    assert [r.name for r in topo.residues] == ["ASN", "ASN", "GLN", "GLN"]
    # Each atom participates in at least one bond; bond indices valid.
    assert topo.bonds.min() >= 0 and topo.bonds.max() < 65
    touched = set(topo.bonds.flatten().tolist())
    assert touched == set(range(65))
    # Every hydrogen has exactly one bond.
    types = topo.atom_types
    h_idx = np.where(types == 1)[0]
    counts = np.zeros(65, dtype=int)
    for i, j in topo.bonds:
        counts[i] += 1
        counts[j] += 1
    assert np.all(counts[h_idx] == 1)


def test_parse_pdb_alanine_dipeptide():
    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    assert [r.name for r in topo.residues] == ["ACE", "ALA", "NME"]
    assert topo.num_atoms == 22
    # 21 bonds for a 22-atom acyclic molecule.
    assert topo.bonds.shape[0] == 21


def test_infer_spacing_logarithmic():
    # Logarithmic spacing 10, 10 steps per decade up to 100.
    steps = np.array([0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 190, 280])
    assert infer_spacing(steps) == 100  # largest interval 90 -> 90*10//9

def test_load_trajectory_pairs(testdata_2olx):
    state0, traj = testdata_2olx
    data = np.load(traj)
    spacing = infer_spacing(data["step"])
    pairs = load_trajectory_pairs("2olx", state0, traj, step_width=spacing)
    assert pairs.num_pairs > 0
    assert pairs.coord_features.shape[1:] == (65, 3)
    # Verify a pair really is (t, t+step_width) in the original arrays.
    steps = data["step"]
    s2i = {int(s): i for i, s in enumerate(steps)}
    found = False
    for i, s in enumerate(steps):
        j = s2i.get(int(s) + spacing)
        if j is not None:
            np.testing.assert_allclose(pairs.coord_features[0], data["positions"][i])
            np.testing.assert_allclose(pairs.coord_targets[0], data["positions"][j])
            found = True
            break
    assert found


def test_datapoints_iterator(testdata_2olx):
    state0, traj = testdata_2olx
    pairs = load_trajectory_pairs("2olx", state0, traj, step_width=1)
    dps = list(pairs.datapoints())
    assert len(dps) == pairs.num_pairs
    if dps:
        assert dps[0].num_atoms == 65


def test_collate_sparse(dummy_datapoints):
    """One-big-graph collation: node offsets, segment ids, static padding
    (reference: moldyn_sparse_collate_fn, dataloader.py:279-326)."""
    from timewarp_tpu.data.batch import collate_sparse

    batch = collate_sparse(dummy_datapoints, pad_multiple=8)
    assert batch.num_graphs == 2
    assert int(batch.num_nodes) == 8  # 3 + 5
    assert batch.atom_coords.shape[0] % 8 == 0
    # second molecule's edges are offset by the first molecule's node count
    adj = np.asarray(batch.adj_list)[np.asarray(batch.adj_mask)]
    np.testing.assert_array_equal(adj[2], [3, 4])  # mol5's first bond
    # segment ids: 3 zeros, 5 ones, padding = num_graphs
    sid = np.asarray(batch.atom_to_sample_id)
    np.testing.assert_array_equal(sid[:8], [0, 0, 0, 1, 1, 1, 1, 1])
    assert (sid[8:] == 2).all()


def test_sparse_per_graph_sum_matches_dense(dummy_datapoints):
    """Per-graph segment reductions drop padding and match a dense masked
    sum; dense_to_sparse round-trips the same graph."""
    from timewarp_tpu.data.batch import collate_dense, collate_sparse, dense_to_sparse

    sparse = collate_sparse(dummy_datapoints)
    dense = collate_dense(dummy_datapoints)
    per_graph = np.asarray(sparse.per_graph_sum(np.asarray(sparse.atom_coords)))
    masked = np.asarray(dense.atom_coords) * (~np.asarray(dense.masked_elements))[..., None]
    np.testing.assert_allclose(per_graph, masked.sum(axis=1), rtol=1e-6)

    roundtrip = dense_to_sparse(dense)
    np.testing.assert_array_equal(
        np.asarray(roundtrip.atom_types), np.asarray(sparse.atom_types)
    )
    np.testing.assert_array_equal(
        np.asarray(roundtrip.adj_list), np.asarray(sparse.adj_list)
    )
    assert roundtrip.names == sparse.names


def test_sparse_batch_jits(dummy_datapoints):
    """SparseBatch is a pytree; per-graph reduction works under jit."""
    import jax

    from timewarp_tpu.data.batch import collate_sparse

    batch = collate_sparse(dummy_datapoints)

    @jax.jit
    def mean_coord_norm(b):
        n = b.per_graph_sum(jnp.linalg.norm(b.atom_coords, axis=-1))
        return n / b.per_graph_sum(b.node_mask.astype(jnp.float32))

    out = mean_coord_norm(batch)
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()
