"""Jitted SPMD training step.

One compiled program per (batch-shape bucket): SE(3) augmentation, velocity
resampling, loss, grads, optimizer update. Data parallelism comes from
sharding the batch over the mesh ``data`` axis; the global-mean loss makes
XLA insert the gradient all-reduce over ICI (replacing DeepSpeed's NCCL
engine, reference: train_deepspeed.py:99-120).

Optimizer-state sharding (the ZeRO-1 analogue of the reference's
``zero_optimization stage 1``) shards every optimizer-state leaf that is
shaped like its parameter along the data axis when divisible.
"""
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from timewarp_tpu.data.batch import DenseBatch
from timewarp_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated_sharding
from timewarp_tpu.utils.geometry import transform_batch


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )


def zero1_sharding_for_leaf(leaf, params_leaves_shapes, mesh: Mesh) -> NamedSharding:
    """Shard a parameter-shaped optimizer leaf along its first mesh-divisible
    axis; otherwise replicate. (Scanned layer stacks have a small leading
    pair axis, so any axis is eligible.)"""
    shape = getattr(leaf, "shape", ())
    n = mesh.devices.size
    if tuple(shape) in params_leaves_shapes:
        for axis, dim in enumerate(shape):
            if dim % n == 0 and dim >= n:
                spec = [None] * len(shape)
                spec[axis] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def train_state_shardings(state: TrainState, mesh: Mesh, zero1: bool = True):
    """Sharding pytree for a TrainState: params replicated, optimizer moment
    buffers optionally ZeRO-1 sharded."""
    rep = replicated_sharding(mesh)
    params_shapes = {tuple(p.shape) for p in jax.tree.leaves(state.params)}
    if not zero1:
        return jax.tree.map(lambda _: rep, state)

    def opt_leaf(leaf):
        return zero1_sharding_for_leaf(leaf, params_shapes, mesh)

    return TrainState(
        step=rep,
        params=jax.tree.map(lambda _: rep, state.params),
        opt_state=jax.tree.map(opt_leaf, state.opt_state),
    )


def make_train_step(
    model,
    loss_fn: Callable,
    optimizer,
    mesh: Optional[Mesh] = None,
    data_augmentation: bool = True,
    zero1: bool = True,
    donate: bool = True,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""

    def step_fn(
        state: TrainState, batch: DenseBatch, rng: jax.Array, energy_system=None
    ):
        k_aug, k_loss = jax.random.split(jax.random.fold_in(rng, state.step))
        if data_augmentation:
            batch = transform_batch(k_aug, batch)

        # Only forward energy_system when present so plain loss callables
        # with the (model, params, batch, rng, step) signature keep working.
        kwargs = {} if energy_system is None else {"energy_system": energy_system}

        def compute(params):
            return loss_fn(model, params, batch, k_loss, step=state.step, **kwargs)

        (loss, metrics), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    if mesh is None:
        fn = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

        def single(state, batch, rng, energy_system=None):
            # names is HOST metadata (pytree_node=False): it is part of the
            # jit static signature, so leaving it in place makes every
            # distinct molecule combination a fresh compile. Nothing inside
            # the step reads it -- strip it at the jit boundary.
            batch = batch.replace(names=())
            if energy_system is None:
                return fn(state, batch, rng)
            return fn(state, batch, rng, energy_system)

        return single

    cache = {}  # jitted fn resolved lazily from the first state's structure

    def jitted(state, batch, rng, energy_system=None):
        batch = batch.replace(names=())  # static metadata, see above
        key = "fn" if energy_system is None else "fn_es"
        if key not in cache:
            state_shardings = train_state_shardings(state, mesh, zero1=zero1)
            bs = jax.tree.map(lambda _: batch_sharding(mesh), batch)
            in_sh = [state_shardings, bs, replicated_sharding(mesh)]
            if energy_system is not None:
                # Stacked per-row system parameters shard with the batch.
                in_sh.append(jax.tree.map(lambda _: batch_sharding(mesh), energy_system))
            cache[key] = jax.jit(
                step_fn,
                in_shardings=tuple(in_sh),
                out_shardings=(state_shardings, None),
                donate_argnums=(0,) if donate else (),
            )
        args = (state, batch, rng) if energy_system is None else (
            state, batch, rng, energy_system
        )
        return cache[key](*args)

    return jitted


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model, loss_fn: Callable, mesh: Optional[Mesh] = None):
    """Jitted eval step. ``step`` is forwarded to the loss so a scheduled
    convex-combination loss is evaluated with the same annealed weights as
    the train step (not frozen at step 0)."""

    def step_fn(params, batch: DenseBatch, rng: jax.Array, step=0, energy_system=None):
        kwargs = {} if energy_system is None else {"energy_system": energy_system}
        loss, metrics = loss_fn(model, params, batch, rng, step=step, **kwargs)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    fn = jax.jit(step_fn)

    def evaluate(params, batch, rng, step=0, energy_system=None):
        return fn(params, batch.replace(names=()), rng, step, energy_system)

    return evaluate
