"""O2 diatomic sanity harness CLI.

Reference: evaluate_o2.py (199 LoC) -- generate harmonic-O2 Langevin data,
train a small conditional density model on it, and compare the model's
sampled bond-length density against the analytic equilibrium density.
A closed-form end-to-end check of the data -> train -> sample loop.

Usage: python -m timewarp_tpu.cli.evaluate_o2 [--train-steps N] [--out DIR]
"""
import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=4000)
    ap.add_argument("--num-samples", type=int, default=2000)
    ap.add_argument("--out", default="outputs/o2")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from timewarp_tpu.data.batch import DenseBatch
    from timewarp_tpu.losses import LossConfig, make_loss
    from timewarp_tpu.models.constructor import ModelConfig, build_model
    from timewarp_tpu.models.gaussian_density import GaussianDensityTransformerConfig
    from timewarp_tpu.models.layers.transformer import TransformerConfig
    from timewarp_tpu.physics.diatomic import (
        analytic_bond_length_density,
        bond_lengths,
        make_o2_system,
    )
    from timewarp_tpu.physics.integrator import (
        maxwell_boltzmann_velocities,
        sample_trajectory,
    )
    from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
    from timewarp_tpu.training.train_step import TrainState, make_train_step

    os.makedirs(args.out, exist_ok=True)
    system = make_o2_system()

    # 1. Langevin data.
    coords0 = jnp.asarray([[0.0, 0.0, 0.0], [0.121, 0.0, 0.0]])
    velocs0 = maxwell_boltzmann_velocities(system, jax.random.PRNGKey(0))
    tc, tv = jax.jit(
        lambda c, v, k: sample_trajectory(system, c, v, k, args.frames, 20)
    )(coords0, velocs0, jax.random.PRNGKey(1))
    tc, tv = np.asarray(tc), np.asarray(tv)

    # 2. Train a small Gaussian density model on consecutive-frame pairs.
    model = build_model(
        ModelConfig(
            model_type="gaussian_density_transformer",
            gaussian_density_transformer_config=GaussianDensityTransformerConfig(
                atom_embedding_dim=8, latent_dim=32, latent_mlp_hidden_dims=(32,),
                num_transformer_layers=2,
                transformer_config=TransformerConfig(n_head=2, dim_feedforward=64),
            ),
        )
    )
    B = 64
    atom_types = jnp.full((B, 2), 3, jnp.int32)  # O
    mask = jnp.zeros((B, 2), bool)
    rng = np.random.default_rng(0)

    def batch_at(idx):
        zeros = jnp.zeros((B, 2, 3), jnp.float32)
        return DenseBatch(
            atom_types=atom_types,
            atom_coords=jnp.asarray(tc[idx]),
            atom_velocs=jnp.asarray(tv[idx]),
            atom_forces=zeros,
            atom_coord_targets=jnp.asarray(tc[idx + 1]),
            atom_veloc_targets=jnp.asarray(tv[idx + 1]),
            atom_force_targets=zeros,
            masked_elements=mask,
            adj_list=jnp.zeros((B, 1, 2), jnp.int32),
            adj_mask=jnp.zeros((B, 1), bool),
            names=("O2",) * B,
        )

    params = model.init(
        jax.random.PRNGKey(2), atom_types, jnp.zeros((B, 2, 3)), jnp.zeros((B, 2, 3)),
        jnp.zeros((B, 2, 3)), jnp.zeros((B, 2, 3)), mask,
    )
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=100))
    state = TrainState.create(params, optimizer)
    loss_fn = make_loss(LossConfig(name="nll", random_velocs=True))
    step = make_train_step(model, loss_fn, optimizer, data_augmentation=True)
    for i in range(args.train_steps):
        idx = rng.integers(0, args.frames - 1, B)
        state, metrics = step(state, batch_at(idx), jax.random.PRNGKey(3))
    final_nll = float(metrics["loss"])

    # 3. Sample conditionally from random data states, compare bond lengths.
    idx = rng.integers(0, args.frames - 1, B)
    b = batch_at(idx)
    S = -(-args.num_samples // B)
    yc, _, _ = model.apply(
        state.params, jax.random.PRNGKey(4), b.atom_types, b.atom_coords,
        jax.random.normal(jax.random.PRNGKey(5), (B, 2, 3)), b.masked_elements,
        S, method="conditional_sample_with_logp",
    )
    r_model = bond_lengths(np.asarray(yc).reshape(-1, 2, 3))
    r_md = bond_lengths(tc)

    grid = np.linspace(min(r_md.min(), r_model.min()) - 1e-3,
                       max(r_md.max(), r_model.max()) + 1e-3, 200)
    p_analytic = analytic_bond_length_density(grid)
    summary = {
        "final_nll": final_nll,
        "bond_mean_md": float(r_md.mean()),
        "bond_mean_model": float(r_model.mean()),
        "bond_std_md": float(r_md.std()),
        "bond_std_model": float(r_model.std()),
        "bond_mean_analytic": float(np.trapezoid(grid * p_analytic, grid)),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
