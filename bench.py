"""Headline benchmark: flow proposal throughput on alanine-dipeptide scale.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json) is AD-1 MH proposals/sec/chip with a
>10k/s target. This currently measures the proposal-generation path of the
MH chain (flow reverse pass, K proposals per call) on the flagship
kernel-attention NVP at full size; once the on-device AMBER energy lands the
metric upgrades to full MH iterations (proposal + energies + reverse logp).
vs_baseline is value / 10_000 (the BASELINE.json target rate).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs, _flagship_model

    model = _flagship_model()
    rng = np.random.default_rng(0)

    # One dipeptide chain state (B=1, V=24 padded from 22), K proposals/call.
    K = 128
    atom_types, x_coords, x_velocs, _, _, masked = _example_inputs(rng, B=1, V=24)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), atom_types, x_coords, x_velocs, x_coords, x_velocs, masked
    )

    @jax.jit
    def propose(params, key):
        yc, yv, logp = model.apply(
            params,
            key,
            atom_types,
            x_coords,
            x_velocs,
            masked,
            K,
            method="conditional_sample_with_logp",
        )
        # Reverse-direction likelihood p(x|y) -- the other half of the MH
        # acceptance computation.
        p_yx = model.apply(
            params,
            jnp.tile(atom_types, (K, 1)),
            yc[:, 0],
            yv[:, 0],
            jnp.tile(x_coords, (K, 1, 1)),
            jnp.tile(x_velocs, (K, 1, 1)),
            jnp.tile(masked, (K, 1)),
            method="log_likelihood",
        )
        return yc, logp, p_yx

    key = jax.random.PRNGKey(1)
    # Compile + two warmup sweeps (the first post-compile executions are
    # slower while the runtime caches settle).
    for w in range(10):
        out = propose(params, jax.random.fold_in(key, 1000 + w))
    jax.block_until_ready(out)

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        out = propose(params, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    proposals_per_sec = K * iters / dt
    print(
        json.dumps(
            {
                "metric": "AD-1 flow proposals/sec/chip (K=128, incl. reverse logp)",
                "value": round(proposals_per_sec, 1),
                "unit": "proposals/s",
                "vs_baseline": round(proposals_per_sec / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
