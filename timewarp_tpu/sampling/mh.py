"""On-device Metropolis-Hastings with batched proposals.

The TPU rebuild of the reference's ``sample_with_model`` chain
(reference: utils/evaluation_utils.py:468-745). One MH iteration draws K
proposals from the flow, evaluates potential energies with the pure-JAX
AMBER potential, computes the reverse proposal likelihood, and accepts the
first proposal that passes -- all inside ONE ``lax.scan`` with static
shapes, so the whole chain is a single XLA program with zero host
round-trips (the reference crossed into OpenMM/C++ twice per iteration,
reference: utils/evaluation_utils.py:628,635).

Variable-length chain bookkeeping (the reference appends a variable prefix
of proposals per iteration) becomes fixed [iters, K] outputs + the
first-accepted index; host code flattens them (sampling/chain_stats.py).

Adaptive parallelism (reference: utils/evaluation_utils.py:32-64) changes K,
i.e. array shapes, so it lives host-side: ``sample_with_model`` runs jitted
fixed-K segments and rebuckets K between segments from the smoothed
acceptance rate.
"""
import dataclasses
import math
import time as _time
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from timewarp_tpu.physics.constants import kbT as kbT_fn
from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.utils.chirality import check_symmetry_change

CHIRALITY_PENALTY = 2000.0  # kT (reference: utils/evaluation_utils.py:642)


@dataclasses.dataclass(frozen=True)
class MHConfig:
    num_proposal_steps: int = 16  # K
    accept: bool = True  # False -> accept everything (requires K=1)
    # Control mode: propose but never accept. With interleaved MD this
    # isolates how much of an ensemble's histogram comes from
    # initialization + MD alone, with the flow contributing nothing
    # (ADVICE round 2, item 1).
    reject_all: bool = False
    random_velocs: bool = True
    resample_velocs: bool = True
    target_acceptance_per_step: float = 0.9
    acceptance_rate_smoothing: float = 0.01
    max_num_proposal_steps: int = 128
    # Feature parity with the reference chain (utils/evaluation_utils.py):
    # random rotation of the current state each iteration (:604-607) and
    # interleaved Langevin MD steps on the current state / on proposals
    # (:558-626; the reference calls OpenMM, here it is the on-device
    # integrator fused into the same scan).
    rotate: bool = False
    md_steps_current: int = 0
    md_steps_proposal: int = 0


@struct.dataclass
class MHState:
    coords: jnp.ndarray  # [V, 3]
    velocs: jnp.ndarray  # [V, 3]
    e_pot: jnp.ndarray  # [] potential of current state (kT)


@struct.dataclass
class SegmentOutputs:
    """Per-iteration, K-wide records. ``first_idx`` is the index of the
    first accepted proposal (K-1 when none accepted)."""

    accepted: jnp.ndarray  # [T, K] bool
    p_acc: jnp.ndarray  # [T, K]
    p_xy: jnp.ndarray  # [T, K]
    p_yx: jnp.ndarray  # [T, K]
    exponent: jnp.ndarray  # [T, K]
    e_pot_y: jnp.ndarray  # [T, K]
    e_kin_y: jnp.ndarray  # [T, K]
    e_pot_delta: jnp.ndarray  # [T, K]
    e_kin_delta: jnp.ndarray  # [T, K]
    first_idx: jnp.ndarray  # [T]
    accepted_any: jnp.ndarray  # [T] bool
    coords: jnp.ndarray  # [T, V, 3] chain state AFTER the iteration
    velocs: jnp.ndarray  # [T, V, 3]
    # The (possibly resampled/MD-stepped/rotated) current state the iteration
    # proposed FROM -- the reference appends first_idx copies of this to the
    # chain (utils/evaluation_utils.py:709-713), which differs from the
    # previous post-iteration state when rotate/interleaved-MD are on.
    x_coords: jnp.ndarray  # [T, V, 3]
    x_velocs: jnp.ndarray  # [T, V, 3]


def compute_num_proposal_steps(
    acceptance_probability: float,
    target_acceptance_per_step: float = 0.9,
    max_num_proposal_steps: int = 100,
) -> int:
    """Proposals per iteration so that >= 1 acceptance happens with the
    target probability (reference: utils/evaluation_utils.py:32-64)."""
    p_rej = min(max(1.0 - acceptance_probability, 1e-3), 1.0 - 1e-3)
    raw = math.log(1.0 - target_acceptance_per_step) / math.log(p_rej)
    if math.isnan(raw):
        raw = float("inf")
    return max(int(math.ceil(min(raw, max_num_proposal_steps))), 1)


def make_flow_proposal(
    model, atom_types, masked_elements, random_velocs=True, temperature=1.0,
    veloc_temperature=None, recalibration=None,
):
    """Adapt a ConditionalFlowDensity into (propose_fn, reverse_logp_fn)
    over unpadded single-molecule states.

    atom_types/masked_elements: [1, V] conditioning metadata.

    ``temperature`` tempers the proposal's latent prior (tau < 1 = colder
    proposals). Both the forward sample logp and the reverse logp are
    evaluated under the SAME tempered density, so MH remains exact for any
    tau (flow.py conditional_sample_with_logp docstring).

    ``recalibration``: optional (ZMatrix, RecalAffine) pair
    (models/recalibration.py). Proposals become y = Psi(y_flow) with the
    exact pushforward density used in BOTH directions, so MH stays exact:
    log q'(y|x) = log q_flow(Psi^{-1}(y)|x) - log|det J_Psi|.
    """

    def propose_fn(params, rng, x_coords, x_velocs, K):
        yc, yv, logp = model.apply(
            params,
            rng,
            atom_types,
            x_coords[None],
            x_velocs[None],
            masked_elements,
            K,
            method="conditional_sample_with_logp",
            temperature=temperature,
            veloc_temperature=veloc_temperature,
        )
        return yc[:, 0], yv[:, 0], logp[:, 0]  # [K, V, 3], [K, V, 3], [K]

    def reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs):
        K = y_coords.shape[0]
        flip = 1.0 if random_velocs else -1.0
        # x may be a single state [V, 3] or per-proposal [K, V, 3] (the
        # conditional recalibration maps x through Psi_y per proposal).
        xc = x_coords if x_coords.ndim == 3 else jnp.tile(x_coords[None], (K, 1, 1))
        xv = x_velocs if x_velocs.ndim == 3 else jnp.tile(x_velocs[None], (K, 1, 1))
        return model.apply(
            params,
            jnp.tile(atom_types, (K, 1)),
            y_coords,
            flip * y_velocs,
            xc,
            flip * xv,
            jnp.tile(masked_elements, (K, 1)),
            method="log_likelihood",
            temperature=temperature,
            veloc_temperature=veloc_temperature,
        )  # [K]

    if recalibration is None:
        return propose_fn, reverse_logp_fn

    from timewarp_tpu.models.recalibration import wrap_proposal

    zm, affine = recalibration
    return wrap_proposal(propose_fn, reverse_logp_fn, zm, affine)


def make_amber_energy(system, temperature: float = 310.0):
    """Potential energy in kT units: [.., V, 3] -> [..]."""
    kT = kbT_fn(temperature)

    @jax.jit
    def e_pot(coords):
        # jit is load-bearing: the eager path dispatches hundreds of small
        # ops individually over the TPU tunnel (~57s for the first call vs
        # ~2s to compile + run as one program).
        if coords.ndim == 2:
            return potential_energy(system, coords) / kT
        return jax.vmap(lambda c: potential_energy(system, c))(coords) / kT

    return e_pot


def make_md_step_fn(system, temperature: float = 310.0):
    """Adapter for the interleaved-MD options: the on-device BAOAB Langevin
    integrator as ``(coords, velocs, key, num_steps) -> (coords, velocs)``
    (the reference interleaves OpenMM steps on the host,
    utils/evaluation_utils.py:558-626; here the integrator fuses into the
    MH scan)."""
    from timewarp_tpu.physics.integrator import LangevinConfig, run_segment

    config = LangevinConfig(temperature=temperature)

    def md_step(coords, velocs, key, num_steps):
        return run_segment(system, coords, velocs, key, num_steps, config)

    return md_step


def kinetic_energy(velocs, masses, kT, random_velocs: bool):
    """[..., V, 3] -> [...] (reference: losses.py:23-44)."""
    if random_velocs:
        return 0.5 * (velocs**2).sum((-1, -2))
    return 0.5 * (masses * (velocs**2).sum(-1)).sum(-1) / kT


@partial(
    jax.jit,
    static_argnames=(
        "propose_fn",
        "reverse_logp_fn",
        "energy_fn",
        "num_iters",
        "K",
        "config",
        "md_step_fn",
    ),
)
def mh_segment(
    params,
    state: MHState,
    rng: jax.Array,
    propose_fn: Callable,
    reverse_logp_fn: Callable,
    energy_fn: Callable,
    masses: jnp.ndarray,
    kT: float,
    num_iters: int,
    K: int,
    config: MHConfig,
    chirality_centers: Optional[jnp.ndarray] = None,
    reference_signs: Optional[jnp.ndarray] = None,
    md_step_fn: Optional[Callable] = None,
) -> Tuple[MHState, SegmentOutputs]:
    """Run ``num_iters`` MH iterations with K proposals each as one scan.

    ``md_step_fn(coords, velocs, key, num_steps) -> (coords, velocs)`` is the
    on-device Langevin integrator used for the interleaved-MD options; it is
    required when config.md_steps_current/proposal > 0.
    """
    velocs_std = jnp.sqrt(kT / masses)[:, None]  # unit-variance -> physical

    def run_md(coords, velocs, key, n):
        """MD under random_velocs semantics: velocities enter in physical
        units and only coordinates are kept (reference:
        utils/evaluation_utils.py:594-601)."""
        if config.random_velocs:
            new_c, _ = md_step_fn(coords, velocs * velocs_std, key, n)
            return new_c, velocs
        return md_step_fn(coords, velocs, key, n)

    def body(state: MHState, key):
        k_vel, k_md, k_rot, k_mdp, k_prop, k_acc = jax.random.split(key, 6)
        x_coords, x_velocs = state.coords, state.velocs
        e_pot_x = state.e_pot

        if config.random_velocs and config.resample_velocs:
            x_velocs = jax.random.normal(k_vel, x_velocs.shape, x_velocs.dtype)

        if config.md_steps_current > 0:
            x_coords, x_velocs = run_md(
                x_coords, x_velocs, k_md, config.md_steps_current
            )
            e_pot_x = energy_fn(x_coords)

        if config.rotate:
            from timewarp_tpu.utils.geometry import random_rotation_matrix

            Q = random_rotation_matrix(k_rot, dtype=x_coords.dtype)
            hi = jax.lax.Precision.HIGHEST
            x_coords = jnp.einsum("ij,vj->vi", Q, x_coords, precision=hi)
            x_velocs = jnp.einsum("ij,vj->vi", Q, x_velocs, precision=hi)
            # Rotation leaves the potential invariant only up to numerics;
            # recompute so the acceptance exponent stays exact.
            e_pot_x = energy_fn(x_coords)

        y_coords, y_velocs, p_xy = propose_fn(params, k_prop, x_coords, x_velocs, K)

        if config.md_steps_proposal > 0:
            keys_p = jax.random.split(k_mdp, K)
            y_coords = jax.vmap(
                lambda c, v, k: run_md(c, v, k, config.md_steps_proposal)[0]
            )(y_coords, y_velocs, keys_p)

        e_kin_x = kinetic_energy(x_velocs, masses, kT, config.random_velocs)
        e_pot_y = energy_fn(y_coords)  # [K]
        e_kin_y = kinetic_energy(y_velocs, masses, kT, config.random_velocs)  # [K]

        if chirality_centers is not None and reference_signs is not None:
            flipped = check_symmetry_change(y_coords, chirality_centers, reference_signs)
            e_pot_y = e_pot_y + CHIRALITY_PENALTY * flipped

        e_pot_delta = e_pot_y - e_pot_x
        e_kin_delta = e_kin_y - e_kin_x

        p_yx = reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs)

        exponent = e_pot_delta + e_kin_delta + p_xy - p_yx  # [K]
        p_acc = jnp.minimum(1.0, jnp.exp(-exponent))

        if config.reject_all:
            accepted = jnp.zeros((K,), bool)
        elif config.accept:
            u = jax.random.uniform(k_acc, (K,))
            accepted = u < p_acc
        else:
            accepted = jnp.ones((K,), bool)

        accepted_any = accepted.any()
        first_idx = jnp.where(accepted_any, jnp.argmax(accepted), K - 1)

        new_coords = jnp.where(accepted_any, y_coords[first_idx], x_coords)
        new_velocs = jnp.where(accepted_any, y_velocs[first_idx], x_velocs)
        new_e_pot = jnp.where(accepted_any, e_pot_y[first_idx], e_pot_x)

        new_state = MHState(coords=new_coords, velocs=new_velocs, e_pot=new_e_pot)
        out = SegmentOutputs(
            accepted=accepted,
            p_acc=p_acc,
            p_xy=p_xy,
            p_yx=p_yx,
            exponent=exponent,
            e_pot_y=e_pot_y,
            e_kin_y=e_kin_y,
            e_pot_delta=e_pot_delta,
            e_kin_delta=e_kin_delta,
            first_idx=first_idx,
            accepted_any=accepted_any,
            coords=new_coords,
            velocs=new_velocs,
            x_coords=x_coords,
            x_velocs=x_velocs,
        )
        return new_state, out

    keys = jax.random.split(rng, num_iters)
    return jax.lax.scan(body, state, keys)


K_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _bucket(k: int, max_k: int) -> int:
    """Smallest K bucket >= k, capped at the largest bucket <= max_k (always
    a member of K_BUCKETS so the compile cache never sees an off-bucket K)."""
    cap = max(b for b in K_BUCKETS if b <= max_k) if max_k >= K_BUCKETS[0] else K_BUCKETS[0]
    for b in K_BUCKETS:
        if b >= k:
            return min(b, cap)
    return cap


class _SegmentRunner:
    """Compiles and launches fixed-K MH segments.

    AOT-compiles each K bucket once (jit.lower().compile()) -- background
    threads pre-warm the buckets an adaptive chain is likely to visit, so a
    mid-chain K change never stalls on a fresh multi-second XLA compile
    (this was the dominant cost of the product loop vs the bare segment
    rate)."""

    def __init__(
        self,
        propose_fn,
        reverse_logp_fn,
        energy_fn,
        config: MHConfig,
        segment_iters: int,
        md_step_fn=None,
    ):
        self.statics = dict(
            propose_fn=propose_fn,
            reverse_logp_fn=reverse_logp_fn,
            energy_fn=energy_fn,
            num_iters=segment_iters,
            config=config,
            md_step_fn=md_step_fn,
        )
        self._compiled = {}
        self._locks = {}
        import threading

        self._threading = threading
        self._master_lock = threading.Lock()

    @staticmethod
    def _kwargs(params, state, rng, masses, kT, centers, signs):
        return dict(
            params=params,
            state=state,
            rng=rng,
            masses=masses,
            kT=kT,
            chirality_centers=centers,
            reference_signs=signs,
        )

    def _compile(self, K, example_args):
        with self._master_lock:
            lock = self._locks.setdefault(K, self._threading.Lock())
        with lock:
            if K not in self._compiled:
                lowered = mh_segment.lower(
                    K=K, **self._kwargs(*example_args), **self.statics
                )
                self._compiled[K] = lowered.compile()
        return self._compiled[K]

    def prewarm(self, buckets, example_args):
        """Compile the given K buckets concurrently in daemon threads."""
        for K in buckets:
            t = self._threading.Thread(
                target=self._compile, args=(K, example_args), daemon=True
            )
            t.start()

    def run(self, K, params, state, rng, masses, kT, centers, signs):
        args = (params, state, rng, masses, kT, centers, signs)
        fn = self._compiled.get(K) or self._compile(K, args)
        # AOT-compiled executables accept the same kwargs structure used at
        # lowering time (statics are baked in).
        return fn(**self._kwargs(*args))


def sample_with_model(
    params,
    propose_fn,
    reverse_logp_fn,
    energy_fn,
    masses,
    kT: float,
    initial_coords,
    initial_velocs,
    rng,
    num_samples: int,
    config: MHConfig = MHConfig(),
    adaptive_parallelism: bool = False,
    segment_iters: int = 64,
    chirality_centers=None,
    reference_signs=None,
    md_step_fn=None,
):
    """Host driver: run jitted fixed-K MH segments until the chain holds
    ``num_samples`` states; rebucket K between segments when adaptive.

    Pipelined: segment n+1 is dispatched (JAX async) BEFORE segment n's
    outputs are pulled to host, so flattening/stats overlap device compute.
    Adaptive K therefore acts with a one-segment lag -- the smoothing factor
    (0.01, reference: utils/evaluation_utils.py:684-697) moves far slower
    than a segment, so the lag is immaterial.

    Returns (sampled_coords [N, V, 3], sampled_velocs, num_accepted, ChainStats).
    """
    from timewarp_tpu.sampling.chain_stats import concat_stats, flatten_segment

    masses = jnp.asarray(masses)
    kT = jnp.asarray(kT, jnp.float32)
    state = MHState(
        coords=jnp.asarray(initial_coords),
        velocs=jnp.asarray(initial_velocs),
        e_pot=energy_fn(jnp.asarray(initial_coords)),
    )

    acc_prob = 1e-3
    K = (
        _bucket(
            compute_num_proposal_steps(
                acc_prob, config.target_acceptance_per_step, config.max_num_proposal_steps
            ),
            config.max_num_proposal_steps,
        )
        if adaptive_parallelism
        else config.num_proposal_steps
    )

    runner = _SegmentRunner(
        propose_fn, reverse_logp_fn, energy_fn, config, segment_iters, md_step_fn
    )
    if adaptive_parallelism:
        buckets = [
            b for b in K_BUCKETS if b <= config.max_num_proposal_steps and b != K
        ]
        rng, warm_rng = jax.random.split(rng)
        runner.prewarm(
            buckets,
            (params, state, warm_rng, masses, kT, chirality_centers, reference_signs),
        )

    def update_acc_prob(acc_prob, accepted_any, first_idx):
        s = config.acceptance_rate_smoothing
        for t in range(len(accepted_any)):
            acc_prob = (
                s * float(accepted_any[t])
                + (1 - s) ** int(first_idx[t]) * acc_prob
            )
        return acc_prob

    def next_bucket(acc_prob):
        return _bucket(
            compute_num_proposal_steps(
                acc_prob,
                config.target_acceptance_per_step,
                config.max_num_proposal_steps,
            ),
            config.max_num_proposal_steps,
        )

    all_stats = []
    coords_parts = [np.asarray(state.coords)[None]]
    velocs_parts = [np.asarray(state.velocs)[None]]
    total_states = 1
    accepted_total = 0
    T = segment_iters

    def process(outputs):
        nonlocal total_states, accepted_total, acc_prob
        # ONE batched device->host pull for the whole segment: per-leaf
        # np.asarray costs ~25ms of tunnel latency per array (15 arrays =
        # ~0.4s/segment, longer than the segment's device compute);
        # device_get on the tree overlaps the transfers (~10x faster).
        outputs = jax.device_get(outputs)
        stats, _ = flatten_segment(outputs)
        all_stats.append(stats)
        first_idx = np.asarray(outputs.first_idx)
        accepted_any = np.asarray(outputs.accepted_any)
        accepted_total += int(accepted_any.sum())
        # Chain states per iteration: first_idx copies of the iteration's
        # (resampled/stepped/rotated) current state, then the new state
        # (reference bookkeeping: utils/evaluation_utils.py:709-713).
        xc, xv = np.asarray(outputs.x_coords), np.asarray(outputs.x_velocs)
        sc, sv = np.asarray(outputs.coords), np.asarray(outputs.velocs)
        reps = np.stack([first_idx, np.ones(T, np.int64)], -1).reshape(-1)
        vals_c = np.stack([xc, sc], 1).reshape(2 * T, *xc.shape[1:])
        vals_v = np.stack([xv, sv], 1).reshape(2 * T, *xv.shape[1:])
        coords_parts.append(np.repeat(vals_c, reps, axis=0))
        velocs_parts.append(np.repeat(vals_v, reps, axis=0))
        total_states += int(reps.sum())
        if adaptive_parallelism:
            acc_prob = update_acc_prob(acc_prob, accepted_any, first_idx)

    inflight = None  # (outputs,) pending host processing
    inflight_K = K
    steady = {"t0": None, "proposals": 0}  # clock starts after first segment
    while total_states < num_samples + 1:
        rng, seg_rng = jax.random.split(rng)
        state, outputs = runner.run(
            K, params, state, seg_rng, masses, kT, chirality_centers, reference_signs
        )
        if inflight is not None:
            process(inflight)  # overlaps with the segment just dispatched
            if steady["t0"] is None:
                steady["t0"] = _time.perf_counter()
            else:
                steady["proposals"] += T * inflight_K
            if adaptive_parallelism:
                K = next_bucket(acc_prob)
        inflight = outputs
        inflight_K = K
        # Rough progress estimate without forcing a sync on the inflight
        # segment: assume it contributes at least T states.
        if total_states + T >= num_samples + 1:
            process(inflight)
            inflight = None
            if adaptive_parallelism:
                K = next_bucket(acc_prob)
    if inflight is not None:
        process(inflight)
        if steady["t0"] is not None:
            steady["proposals"] += T * inflight_K

    coords = np.concatenate(coords_parts, axis=0)[: num_samples + 1]
    velocs = np.concatenate(velocs_parts, axis=0)[: num_samples + 1]
    stats = concat_stats(all_stats)
    if steady["t0"] is not None and steady["proposals"]:
        dt = _time.perf_counter() - steady["t0"]
        stats.steady_proposals_per_s = steady["proposals"] / dt
    return coords, velocs, accepted_total, stats
