"""Cross-replica consistency checks.

Reference: utilities/distributed_iterable_dataset.py:8-20 asserts RNG-state
equality across ranks before epochs (a determinism/race guard). The SPMD
equivalents here verify that values that must be replica-identical (seeds,
parameters) actually are, using collectives over the mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh



def check_replicated(tree, mesh: Mesh, atol: float = 0.0) -> bool:
    """True iff every leaf is identical across mesh devices: compares each
    device shard of a (supposedly) replicated pytree against device 0."""
    devices = list(mesh.devices.flat)
    ref = jax.device_get(jax.tree.map(lambda x: x, tree))

    ok = True
    for leaf in jax.tree.leaves(tree):
        arr = getattr(leaf, "addressable_shards", None)
        if arr is None:
            continue
        base = None
        for shard in leaf.addressable_shards:
            data = np.asarray(shard.data)
            if base is None:
                base = data
            elif not np.allclose(base, data, atol=atol):
                ok = False
    return ok


def check_host_value_consistency(value, tag: str = "seed") -> bool:
    """Multi-host: verify a host-side scalar (seed, path hash) is identical
    on every process via broadcast-compare; single-process is trivially
    consistent (reference: broadcast_from_leader semantics,
    utilities/deepspeed_utils.py:75-101)."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    mine = jnp.asarray(np.float64(hash(value) % (2**31)))
    leader = multihost_utils.broadcast_one_to_all(mine)
    consistent = bool(mine == leader)
    if not consistent:
        raise RuntimeError(f"host value {tag!r} differs from process 0")
    return consistent


def broadcast_from_leader(value):
    """Broadcast a small numpy-compatible value from process 0 to all hosts
    (single-process: identity)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(jnp.asarray(value))
