"""Headline benchmark: full Metropolis-Hastings iteration throughput on
alanine dipeptide (the BASELINE.json north-star metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Each MH iteration = K flow proposals + on-device AMBER potential energies of
all proposals + reverse proposal likelihoods + accept/reject bookkeeping --
the complete product loop of the reference's evaluate.py --mh
(utils/evaluation_utils.py:468-745), fused into one lax.scan segment.
vs_baseline = proposals/sec / 10_000 (the north-star target rate).

Uses trained parameters (runs/ad_params2.pkl or runs/ad_params.pkl) when
present; random init otherwise (identical compute).
"""
import json
import os
import pickle
import time

import numpy as np


def _tunnel_alive(host="127.0.0.1", port=8103, timeout=2.0):
    """True iff the axon relay's remote-compile port accepts TCP connects."""
    import socket

    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect((host, port))
        return True
    except OSError:
        return False
    finally:
        s.close()


def main():
    import jax

    force_cpu = os.environ.get("BENCH_FORCE_CPU") == "1"
    if not force_cpu and not _tunnel_alive():
        # Fast pre-probe: when the axon relay is down its remote-compile
        # port (the tunnel's TPU-compile path) stops listening, and the
        # axon backend can stall for minutes before raising. Probing the
        # port first keeps the bench line prompt. The exception fallback
        # below still covers a relay that accepts connections but fails
        # mid-run (observed: second round-4 outage killed a running eval).
        import sys

        sys.stderr.write("[bench] axon relay port closed; using CPU\n")
        force_cpu = True
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import kbT
    from timewarp_tpu.sampling.mh import (
        MHConfig,
        MHState,
        make_amber_energy,
        make_flow_proposal,
        mh_segment,
    )

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    system, _ = build_system(topo)
    V = topo.num_atoms

    model = _flagship_model()
    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    coords0 = jnp.asarray(topo.positions)
    velocs0 = jnp.zeros((V, 3))

    params = None
    # THE product checkpoint is declared in PRODUCT.json (single source of
    # truth shared by bench.py, cli.evaluate docs, and the README table --
    # VERDICT round 3, next-steps #4). Fallbacks keep the bench runnable in
    # a fresh clone with no trained checkpoints.
    import glob

    cands = []
    try:
        with open("PRODUCT.json") as f:
            cands.append(json.load(f)["checkpoint"])
    except Exception:
        pass
    cands += (
        glob.glob("runs/adB_healed.pkl")
        + glob.glob("runs/adB_product.pkl")
        + sorted(
            glob.glob("runs/ad_params*.pkl") + glob.glob("runs/ad1_parity.pkl"),
            key=os.path.getmtime,
            reverse=True,
        )
    )
    for cand in cands:
        try:
            with open(cand, "rb") as f:
                params = jax.device_put(pickle.load(f))
            break
        except Exception:
            continue
    if params is None:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), atom_types, coords0[None], velocs0[None],
            coords0[None], velocs0[None], mask,
        )

    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
    energy_fn = make_amber_energy(system)
    masses = jnp.asarray(system.masses)
    kT = float(kbT())
    cfg = MHConfig(num_proposal_steps=64, resample_velocs=True)

    # CPU fallback uses a tiny segment: compiling the full 32-iteration
    # scanned MH graph on host XLA takes minutes and the number is only a
    # liveness signal, not the headline.
    K, iters = (8, 2) if force_cpu else (64, 32)
    state = MHState(coords=coords0, velocs=velocs0, e_pot=energy_fn(coords0))

    def run(state, seed):
        return mh_segment(
            params, state, jax.random.PRNGKey(seed),
            propose_fn, reverse_logp_fn, energy_fn, masses, kT,
            iters, K, cfg,
        )

    # Compile + warmup.
    state_w, out = run(state, 0)
    jax.block_until_ready(out.p_acc)
    state_w, out = run(state, 1)
    jax.block_until_ready(out.p_acc)

    reps = 2 if force_cpu else 5
    t0 = time.perf_counter()
    for r in range(reps):
        state_w, out = run(state_w, 2 + r)
    jax.block_until_ready(out.p_acc)
    dt = time.perf_counter() - t0

    proposals_per_sec = K * iters * reps / dt
    print(
        json.dumps(
            {
                "metric": "AD-1 full MH proposals/sec/chip (flow + on-device "
                f"AMBER energy + reverse logp, K={K})"
                + (" [CPU FALLBACK: TPU tunnel unavailable]" if force_cpu else ""),
                "value": round(proposals_per_sec, 1),
                "unit": "proposals/s",
                "vs_baseline": round(proposals_per_sec / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        if os.environ.get("BENCH_FORCE_CPU") != "1":
            # The axon TPU tunnel can die out from under the container
            # (observed round 4: the relay's orchestrator link closed and
            # every forwarded port stopped listening). Re-exec on CPU so the
            # bench still emits its one JSON line, honestly labeled.
            import sys

            sys.stderr.write(
                f"[bench] TPU path failed ({type(e).__name__}: {e}); "
                "retrying on CPU\n"
            )
            sys.stderr.flush()
            os.execve(
                sys.executable,
                [sys.executable, os.path.abspath(__file__)],
                dict(os.environ, BENCH_FORCE_CPU="1"),
            )
        raise
