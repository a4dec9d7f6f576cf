"""Every shipped YAML config loads and builds its model."""
import glob
import os

import jax
import numpy as np
import pytest

from timewarp_tpu.config import load_config
from timewarp_tpu.models.constructor import build_model

CONFIGS = sorted(glob.glob("/root/repo/configs/*.yaml"))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads_and_builds(path):
    cfg = load_config(path)
    model = build_model(cfg.model_config)
    assert model is not None
    assert cfg.step_width > 0
    assert cfg.optimizer_config().learning_rate > 0
