"""Checkpointing with orbax (sharded-array aware).

Reference formats (SURVEY.md section 5): plain torch.save dicts with
model/optimizer/scheduler/config/epoch (utilities/model_utils.py:12-29),
periodic `latest_model` + `best_model` files, and resume-scan of the output
folder (train.py:215-230). Here a single orbax checkpointer stores the
TrainState pytree + config + epoch under `latest` / `best` names.
"""
import json
import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from timewarp_tpu.training.train_step import TrainState


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: TrainState, epoch: int, extra: Optional[dict] = None):
        path = self._path(name)
        self._ckpt.save(path, {"state": state, "epoch": epoch}, force=True)
        meta = {"epoch": epoch, **(extra or {})}
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)

    def restore(self, name: str, template: TrainState) -> Tuple[TrainState, int]:
        path = self._path(name)
        restored = self._ckpt.restore(path, item={"state": template, "epoch": 0})
        return restored["state"], int(restored["epoch"])

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))


class PeriodicCheckpointer:
    """Write `latest` every min_interval steps
    (reference: utilities/training_utils.py:280-323)."""

    def __init__(self, checkpointer: Checkpointer, min_interval: int = 5000):
        self.checkpointer = checkpointer
        self.min_interval = min_interval
        self._last_step = 0

    def maybe_save(self, step: int, state: TrainState, epoch: int):
        if step - self._last_step >= self.min_interval:
            self.checkpointer.save("latest", state, epoch)
            self._last_step = step


def find_resume_dir(output_folder: str, run_name: str) -> Optional[str]:
    """Scan the output folder for a prior run of the same name with a
    `latest` checkpoint (reference: train.py:215-230)."""
    base = os.path.join(output_folder, run_name)
    if os.path.isdir(base) and os.path.exists(os.path.join(base, "latest")):
        return base
    return None
