"""Profiling CLI (the reference's standalone profile.py): time the forward
sampling path and capture a jax.profiler trace + device memory stats.

Usage: python -m timewarp_tpu.cli.profile [--params P] [--trace-dir DIR]
"""
import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--state0-pdb", default="/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    ap.add_argument("--num-proposals", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from timewarp_tpu.config import load_config
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.models.constructor import ModelConfig, build_model
    from timewarp_tpu.training.profiling import device_memory_stats, trace

    topo = parse_pdb(args.state0_pdb)
    V = topo.num_atoms
    model_config = load_config(args.config).model_config if args.config else ModelConfig()
    model = build_model(model_config)

    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    coords = jnp.asarray(topo.positions)[None]
    velocs = jnp.zeros((1, V, 3))

    if args.params:
        import pickle

        with open(args.params, "rb") as f:
            params = jax.device_put(pickle.load(f))
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), atom_types, coords, velocs, coords, velocs, mask
        )

    fn = jax.jit(
        lambda p, k: model.apply(
            p, k, atom_types, coords, velocs, mask,
            args.num_proposals, method="conditional_sample_with_logp",
        )
    )
    t0 = time.perf_counter()
    out = fn(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    def loop():
        for i in range(args.iters):
            o = fn(params, jax.random.fold_in(jax.random.PRNGKey(2), i))
        jax.block_until_ready(o)

    loop()  # warmup
    t0 = time.perf_counter()
    if args.trace_dir:
        with trace(args.trace_dir):
            loop()
    else:
        loop()
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "compile_seconds": round(compile_s, 2),
                "sample_ms_per_call": round(dt / args.iters * 1000, 2),
                "proposals_per_sec": round(args.num_proposals * args.iters / dt, 1),
                "memory": device_memory_stats(),
                "trace_dir": args.trace_dir,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
