"""Ensemble Metropolis-Hastings: W independent chains vmapped over one mesh
of proposals, with on-device Ramachandran accumulation.

The reference explores with a batch of parallel walkers (exploration.py:124-
259) but its exact-MH product loop is a single chain whose states round-trip
to the host every iteration (utils/evaluation_utils.py:468-745). On TPU the
natural layout is W chains advanced together: every iteration evaluates a
[W, K] block of flow proposals and AMBER energies -- one big MXU-friendly
batch instead of K small ones -- and the chain's *statistics* (weighted
phi/psi histogram, acceptance counters) are accumulated inside the scan, so
a million-proposal ensemble returns a [bins, bins] histogram and a handful
of scalars instead of streaming every state through the host.

Chain-state weighting matches the reference's bookkeeping exactly
(utils/evaluation_utils.py:709-713): each iteration contributes
``first_idx`` copies of the (resampled/rotated/MD-stepped) current state
plus one copy of the iteration's final state, so histogram weights are
(first_idx, 1). Torsions are rotation-invariant, so the random-rotation
option does not disturb the histogram.
"""
import dataclasses
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from timewarp_tpu.data.pdb import Topology
from timewarp_tpu.parallel.mesh import DATA_AXIS
from timewarp_tpu.sampling.mh import (
    CHIRALITY_PENALTY,
    K_BUCKETS,
    MHConfig,
    MHState,
    _bucket,
    compute_num_proposal_steps,
    kinetic_energy,
)
from timewarp_tpu.utils.chirality import check_symmetry_change
from timewarp_tpu.utils.geometry import random_rotation_matrix
from timewarp_tpu.utils.torsions import compute_torsions, phi_psi_indices


def paired_phi_psi_indices(topology: Topology) -> Tuple[np.ndarray, np.ndarray]:
    """(phi_quads [P, 4], psi_quads [P, 4]) aligned so pair p is one
    residue's (phi, psi) -- the points of a Ramachandran plot.

    Uncapped dipeptides (the reference's tleap-built 2AA peptides,
    create_random_peptides.py) have NO residue with both torsions: phi
    exists only on residue 2, psi only on residue 1. In that case the
    (phi_{i+1}, psi_i) cross-residue pair is returned -- the same pair the
    reference's mdtraj-based analysis plots for 2AA (compute_phi/psi
    return whatever dihedrals exist, utils/torsion_utils.py:22-162)."""

    def torsion_atoms(i):
        res = topology.residues
        n = topology.atom_index(res[i], "N")
        ca = topology.atom_index(res[i], "CA")
        c = topology.atom_index(res[i], "C")
        if None in (n, ca, c):
            return None, None
        phi = psi = None
        if i > 0:
            c_prev = topology.atom_index(res[i - 1], "C")
            if c_prev is not None:
                phi = (c_prev, n, ca, c)
        if i + 1 < len(res):
            n_next = topology.atom_index(res[i + 1], "N")
            if n_next is not None:
                psi = (n, ca, c, n_next)
        return phi, psi

    R = len(topology.residues)
    phi_of = {}
    psi_of = {}
    for i in range(R):
        phi, psi = torsion_atoms(i)
        if phi is not None:
            phi_of[i] = phi
        if psi is not None:
            psi_of[i] = psi

    phis, psis = [], []
    for i in range(R):
        if i in phi_of and i in psi_of:
            phis.append(phi_of[i])
            psis.append(psi_of[i])
    if not phis:
        # Dipeptide fallback: (phi of residue i+1, psi of residue i).
        for i in range(R - 1):
            if i + 1 in phi_of and i in psi_of:
                phis.append(phi_of[i + 1])
                psis.append(psi_of[i])
    return (
        np.array(phis, dtype=np.int32).reshape(-1, 4),
        np.array(psis, dtype=np.int32).reshape(-1, 4),
    )


@struct.dataclass
class EnsembleCarry:
    state: MHState  # batched [W, ...]
    hist: jnp.ndarray  # [bins * bins] weighted phi/psi histogram
    num_accepted: jnp.ndarray  # [] int32
    num_states: jnp.ndarray  # [] int32 (chain states accumulated, incl. repeats)


def _hist_indices(phi, psi, bins):
    """phi/psi [..., P] radians -> flat bin indices [..., P]."""
    scale = bins / (2.0 * jnp.pi)
    bp = jnp.clip(((phi + jnp.pi) * scale).astype(jnp.int32), 0, bins - 1)
    bq = jnp.clip(((psi + jnp.pi) * scale).astype(jnp.int32), 0, bins - 1)
    return bp * bins + bq


@partial(
    jax.jit,
    static_argnames=(
        "propose_fn",
        "reverse_logp_fn",
        "energy_fn",
        "num_iters",
        "K",
        "bins",
        "config",
        "md_step_fn",
    ),
)
def ensemble_segment(
    params,
    carry: EnsembleCarry,
    rng: jax.Array,
    masses: jnp.ndarray,
    kT: jnp.ndarray,
    phi_quads: jnp.ndarray,
    psi_quads: jnp.ndarray,
    *,
    propose_fn: Callable,
    reverse_logp_fn: Callable,
    energy_fn: Callable,
    num_iters: int,
    K: int,
    bins: int,
    config: MHConfig,
    chirality_centers=None,
    reference_signs=None,
    md_step_fn=None,
):
    """Advance W chains ``num_iters`` iterations; returns the new carry.

    The per-walker iteration body mirrors sampling/mh.py:mh_segment exactly
    (resample velocities -> optional MD/rotation -> K proposals -> first
    acceptance); walkers are vmapped so proposals and energies evaluate as
    [W, K] blocks.
    """
    velocs_std = jnp.sqrt(kT / masses)[:, None]

    def run_md(coords, velocs, key, n):
        if config.random_velocs:
            new_c, _ = md_step_fn(coords, velocs * velocs_std, key, n)
            return new_c, velocs
        return md_step_fn(coords, velocs, key, n)

    def walker_iter(state: MHState, key):
        """One MH iteration for one walker. Returns (new_state,
        (first_idx, accepted_any, x_coords, new_coords))."""
        k_vel, k_md, k_rot, k_mdp, k_prop, k_acc = jax.random.split(key, 6)
        x_coords, x_velocs = state.coords, state.velocs
        e_pot_x = state.e_pot

        if config.random_velocs and config.resample_velocs:
            x_velocs = jax.random.normal(k_vel, x_velocs.shape, x_velocs.dtype)
        if config.md_steps_current > 0:
            x_coords, x_velocs = run_md(x_coords, x_velocs, k_md, config.md_steps_current)
            e_pot_x = energy_fn(x_coords)
        if config.rotate:
            Q = random_rotation_matrix(k_rot, dtype=x_coords.dtype)
            hi = jax.lax.Precision.HIGHEST
            x_coords = jnp.einsum("ij,vj->vi", Q, x_coords, precision=hi)
            x_velocs = jnp.einsum("ij,vj->vi", Q, x_velocs, precision=hi)
            e_pot_x = energy_fn(x_coords)

        y_coords, y_velocs, p_xy = propose_fn(params, k_prop, x_coords, x_velocs, K)
        if config.md_steps_proposal > 0:
            keys_p = jax.random.split(k_mdp, K)
            y_coords = jax.vmap(
                lambda c, v, k: run_md(c, v, k, config.md_steps_proposal)[0]
            )(y_coords, y_velocs, keys_p)

        e_kin_x = kinetic_energy(x_velocs, masses, kT, config.random_velocs)
        e_pot_y = energy_fn(y_coords)
        e_kin_y = kinetic_energy(y_velocs, masses, kT, config.random_velocs)
        if chirality_centers is not None and reference_signs is not None:
            flipped = check_symmetry_change(y_coords, chirality_centers, reference_signs)
            e_pot_y = e_pot_y + CHIRALITY_PENALTY * flipped

        p_yx = reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs)
        exponent = (e_pot_y - e_pot_x) + (e_kin_y - e_kin_x) + p_xy - p_yx
        p_acc = jnp.minimum(1.0, jnp.exp(-exponent))
        if config.reject_all:
            accepted = jnp.zeros((K,), bool)
        elif config.accept:
            accepted = jax.random.uniform(k_acc, (K,)) < p_acc
        else:
            accepted = jnp.ones((K,), bool)
        accepted_any = accepted.any()
        first_idx = jnp.where(accepted_any, jnp.argmax(accepted), K - 1)
        new_coords = jnp.where(accepted_any, y_coords[first_idx], x_coords)
        new_velocs = jnp.where(accepted_any, y_velocs[first_idx], x_velocs)
        new_e_pot = jnp.where(accepted_any, e_pot_y[first_idx], e_pot_x)
        new_state = MHState(coords=new_coords, velocs=new_velocs, e_pot=new_e_pot)
        return new_state, (first_idx, accepted_any, x_coords, new_coords)

    W = carry.state.coords.shape[0]

    def body(c: EnsembleCarry, key):
        keys = jax.random.split(key, W)
        new_state, (first_idx, accepted_any, x_coords, new_coords) = jax.vmap(
            walker_iter
        )(c.state, keys)

        # Weighted histogram update: first_idx copies of x + 1 copy of the
        # iteration's final state, per walker and residue pair.
        phi_x = compute_torsions(x_coords, phi_quads)  # [W, P]
        psi_x = compute_torsions(x_coords, psi_quads)
        phi_n = compute_torsions(new_coords, phi_quads)
        psi_n = compute_torsions(new_coords, psi_quads)
        idx_x = _hist_indices(phi_x, psi_x, bins).reshape(-1)
        idx_n = _hist_indices(phi_n, psi_n, bins).reshape(-1)
        P = phi_quads.shape[0]
        w_x = jnp.repeat(first_idx.astype(jnp.float32), P)
        hist = c.hist.at[idx_x].add(w_x).at[idx_n].add(1.0)

        return (
            EnsembleCarry(
                state=new_state,
                hist=hist,
                num_accepted=c.num_accepted + accepted_any.sum(dtype=jnp.int32),
                num_states=c.num_states
                + first_idx.sum(dtype=jnp.int32)
                + jnp.int32(W),
            ),
            None,
        )

    carry, _ = jax.lax.scan(body, carry, jax.random.split(rng, num_iters))
    return carry


@dataclasses.dataclass
class EnsembleResults:
    hist: np.ndarray  # [bins, bins] weighted, unnormalized
    acceptance_rate: float
    num_proposals: int
    num_accepted: int
    num_states: int
    final_coords: np.ndarray  # [W, V, 3]
    snapshots: np.ndarray  # [S, W, V, 3] one per segment
    K_trace: Tuple[int, ...] = ()  # K used per segment (adaptive parallelism)


def sample_ensemble(
    params,
    propose_fn,
    reverse_logp_fn,
    energy_fn,
    masses,
    kT: float,
    initial_coords,  # [W, V, 3]
    rng,
    topology: Topology,
    num_proposals: int,
    config: MHConfig = MHConfig(),
    bins: int = 18,
    segment_iters: int = 256,
    chirality_centers=None,
    reference_signs=None,
    md_step_fn=None,
    log_every: int = 0,
    adaptive_parallelism: bool = False,
    mesh=None,
) -> EnsembleResults:
    """Run W parallel MH chains for ~num_proposals total flow proposals.

    Only O(bins^2) statistics and one [W, V, 3] snapshot per segment cross
    the device boundary.

    With ``adaptive_parallelism`` the per-walker proposal count K is
    rebucketed between segments from the smoothed chain acceptance rate
    (reference: utils/evaluation_utils.py:32-64,684-697). At acceptance ~2%
    a fixed K=32 wastes ~45% of proposals past each iteration's first
    acceptance; adapting K recovers that as extra chain states per proposal.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh`` over the ``data`` axis) the
    walker axis is sharded across devices: walkers are independent chains,
    so the segment runs embarrassingly parallel and only the shared
    histogram/counter reductions cross devices (XLA inserts those over ICI).
    W must divide the mesh size. This is the TPU-native scale-out of the
    *product* sampler -- the reference has no multi-GPU sampling at all
    (its MH chain is single-GPU, utils/evaluation_utils.py:468-745).
    """
    initial_coords = jnp.asarray(initial_coords)
    # Always run at least one segment: with num_proposals <= 0 the loop
    # below would produce no snapshots (np.stack on an empty list).
    num_proposals = max(num_proposals, 1)
    W, V = initial_coords.shape[0], initial_coords.shape[1]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        n_dev = mesh.devices.size
        if W % n_dev:
            raise ValueError(f"walkers ({W}) must divide the mesh size ({n_dev})")
        walker_sh = NamedSharding(mesh, _P(DATA_AXIS))
        initial_coords = jax.device_put(initial_coords, walker_sh)
    K = config.num_proposal_steps
    max_K = min(config.max_num_proposal_steps, max(K_BUCKETS))
    if adaptive_parallelism:
        K = _bucket(
            compute_num_proposal_steps(
                1e-3, config.target_acceptance_per_step, max_K
            ),
            max_K,
        )
    masses = jnp.asarray(masses)
    kT_dev = jnp.asarray(kT, jnp.float32)
    phi_quads, psi_quads = paired_phi_psi_indices(topology)
    if phi_quads.shape[0] == 0:
        raise ValueError("topology has no interior residues with phi+psi")

    velocs0 = jnp.zeros((W, V, 3), initial_coords.dtype)
    e_pot0 = energy_fn(initial_coords)
    if mesh is not None:
        velocs0 = jax.device_put(velocs0, walker_sh)
        e_pot0 = jax.device_put(e_pot0, walker_sh)
    carry = EnsembleCarry(
        state=MHState(coords=initial_coords, velocs=velocs0, e_pot=e_pot0),
        hist=jnp.zeros(bins * bins, jnp.float32),
        num_accepted=jnp.int32(0),
        num_states=jnp.int32(0),
    )

    snapshots: List[np.ndarray] = []
    K_trace: List[int] = []
    proposals_done = 0
    acc_prob = 1e-3
    prev_acc, prev_states = 0, 0
    s = 0
    while proposals_done < num_proposals:
        rng, seg_rng = jax.random.split(rng)
        carry = ensemble_segment(
            params,
            carry,
            seg_rng,
            masses,
            kT_dev,
            jnp.asarray(phi_quads),
            jnp.asarray(psi_quads),
            propose_fn=propose_fn,
            reverse_logp_fn=reverse_logp_fn,
            energy_fn=energy_fn,
            num_iters=segment_iters,
            K=K,
            bins=bins,
            config=config,
            chirality_centers=chirality_centers,
            reference_signs=reference_signs,
            md_step_fn=md_step_fn,
        )
        K_trace.append(K)
        proposals_done += W * K * segment_iters
        s += 1
        snapshots.append(np.asarray(carry.state.coords))
        acc_total, states_total = int(carry.num_accepted), int(carry.num_states)
        if adaptive_parallelism:
            # Segment-granular EMA of the chain acceptance rate (accepted /
            # attempted-until-first-accept), then the reference's K formula.
            d_states = max(states_total - prev_states, 1)
            seg_acc = (acc_total - prev_acc) / d_states
            prev_acc, prev_states = acc_total, states_total
            # Equivalent smoothing mass to the reference's per-proposal
            # s=0.01 EMA applied d_states times.
            w = 1.0 - (1.0 - config.acceptance_rate_smoothing) ** d_states
            acc_prob = w * seg_acc + (1.0 - w) * acc_prob
            K = _bucket(
                compute_num_proposal_steps(
                    acc_prob, config.target_acceptance_per_step, max_K
                ),
                max_K,
            )
        if log_every and s % log_every == 0:
            acc = acc_total / max(states_total, 1)
            print(
                f"[ensemble] segment {s}: {proposals_done} proposals, "
                f"acceptance {acc:.4f}, K={K}",
                flush=True,
            )

    return EnsembleResults(
        hist=np.asarray(carry.hist).reshape(bins, bins),
        # accepted / attempted-until-first-accept: matches
        # ChainStats.acceptance_rate (chain_stats.py:56-57), which flattens
        # the first_idx+1 attempts each iteration actually consumed.
        acceptance_rate=int(carry.num_accepted) / max(int(carry.num_states), 1),
        num_proposals=proposals_done,
        num_accepted=int(carry.num_accepted),
        num_states=int(carry.num_states),
        final_coords=np.asarray(carry.state.coords),
        snapshots=np.stack(snapshots),
        K_trace=tuple(K_trace),
    )


def histogram_kl(hist_a: np.ndarray, hist_b: np.ndarray, eps: float = 1e-8) -> float:
    """Symmetrized KL between two unnormalized 2-D histograms."""
    a = hist_a.astype(np.float64) + eps
    b = hist_b.astype(np.float64) + eps
    a /= a.sum()
    b /= b.sum()
    return float(np.sum(a * np.log(a / b)) + np.sum(b * np.log(b / a)))


def ramachandran_histogram(
    coords: np.ndarray, topology: Topology, bins: int = 18
) -> np.ndarray:
    """Weight-1 histogram of a conformation set, same binning as the
    ensemble accumulator (for KL against MD data)."""
    phi_quads, psi_quads = paired_phi_psi_indices(topology)
    phi = np.asarray(compute_torsions(jnp.asarray(coords), phi_quads)).ravel()
    psi = np.asarray(compute_torsions(jnp.asarray(coords), psi_quads)).ravel()
    # Same clipped integer binning as the on-device accumulator
    # (_hist_indices): float32 angles can land exactly at +-pi, which
    # np.histogram2d's [-pi, pi] range would silently drop.
    scale = bins / (2.0 * np.pi)
    bp = np.clip(((phi + np.pi) * scale).astype(np.int64), 0, bins - 1)
    bq = np.clip(((psi + np.pi) * scale).astype(np.int64), 0, bins - 1)
    h = np.zeros((bins, bins), np.float64)
    np.add.at(h, (bp, bq), 1.0)
    return h
