"""Parameter loading for the inference CLIs: pickled pytrees or orbax
checkpoint directories (as written by training/checkpoints.py)."""
import os
import pickle


def load_params(path: str):
    """Return a params pytree from a .pkl file or an orbax checkpoint dir
    (extracting TrainState.params)."""
    import jax

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        state = restored.get("state", restored)
        params = state.get("params", state)
        return jax.device_put(params)
    with open(path, "rb") as f:
        return jax.device_put(pickle.load(f))
