"""Typed training configuration with YAML + dotlist overrides.

The reference validates YAML configs against OmegaConf structured schemas
with CLI dotlist overrides merged last (reference: utils/config_utils.py:29-51,
training_config.py:12-71). OmegaConf is not in the image, so the same
behavior is implemented over dataclasses: unknown fields error, nested
fields address with dots, deprecated fields are dropped with a warning.
"""
import dataclasses
import warnings
from typing import Any, Dict, Optional, Sequence

import yaml

from timewarp_tpu.losses import LossConfig
from timewarp_tpu.models.constructor import (
    ConditionalFlowDensityConfig,
    CustomAttentionTransformerNVPConfig,
    EquivariantNVPConfig,
    ModelConfig,
    TransformerNVPConfig,
)
from timewarp_tpu.models.cvae import TransformerCVAEConfig
from timewarp_tpu.models.gaussian_density import GaussianDensityTransformerConfig
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.models.layers.rff import RFFPositionEncoderConfig
from timewarp_tpu.models.layers.transformer import TransformerConfig
from timewarp_tpu.training.optim import OptimizerConfig

DEPRECATED_FIELDS = {"use_aml_logging", "measure_equivariance_discrepancy"}


@dataclasses.dataclass
class TrainingConfig:
    """Reference: training_config.py:12-71."""

    dataset: str = "AD-1"
    model_config: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    step_width: int = 1000
    batch_size: int = 32
    num_epochs: int = 100
    patience: int = 100
    data_augmentation: bool = True
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    optimizer: str = "adam"
    learning_rate: float = 1e-4
    warmup_steps: int = 1000
    weight_decay: float = 0.0
    clip_grad_norm: Optional[float] = None
    seed: int = 0
    randomise_seed: bool = False
    # Multi-host SPMD: call jax.distributed.initialize() at startup and
    # shard the input pipeline by jax.process_index()/process_count().
    distributed: bool = False
    data_dir: Optional[str] = None
    dataset_cache_dir: str = ".data"
    pdb_dir: Optional[str] = None
    output_folder: str = "outputs"
    enable_profiler: bool = False
    saved_model_path: Optional[str] = None
    valid_batch_size: int = 0
    min_check_point_iters: int = 5000
    random_velocities: bool = True
    warm_start: bool = False
    num_pdbs_per_local_batch: Optional[int] = None
    equal_data_spacing: bool = False
    run_valid_first: bool = True
    run_prefix: str = ""

    def __post_init__(self):
        self.valid_batch_size = self.valid_batch_size or self.batch_size

    def optimizer_config(self) -> OptimizerConfig:
        return OptimizerConfig(
            name=self.optimizer.lower(),
            learning_rate=self.learning_rate,
            warmup_steps=self.warmup_steps,
            weight_decay=self.weight_decay,
            clip_grad_norm=self.clip_grad_norm,
        )


_NESTED_TYPES = {
    "model_config": ModelConfig,
    "transformer_nvp_config": TransformerNVPConfig,
    "custom_transformer_nvp_config": CustomAttentionTransformerNVPConfig,
    "encoder_layer_config": CustomAttentionEncoderConfig,
    "transformer_config": TransformerConfig,
    "rff_position_encoder_config": RFFPositionEncoderConfig,
    "conditional_flow_density": ConditionalFlowDensityConfig,
    "equivariant_nvp_config": EquivariantNVPConfig,
    "transformer_cvae_config": TransformerCVAEConfig,
    "gaussian_density_transformer_config": GaussianDensityTransformerConfig,
    "loss": LossConfig,
}


def _coerce(cls, key: str, value):
    """Schema-driven scalar coercion (YAML parses '1e-4' as a string)."""
    import typing

    try:
        hints = typing.get_type_hints(cls)
    except Exception:
        return value
    t = hints.get(key)
    args = typing.get_args(t)
    if args:  # Optional[...] and friends
        non_none = [a for a in args if a is not type(None)]
        t = non_none[0] if len(non_none) == 1 else t
    if t is float and isinstance(value, (str, int)):
        return float(value)
    if t is int and isinstance(value, str):
        return int(value)
    return value


def _from_dict(cls, data: Dict[str, Any]):
    """Recursively build a dataclass, erroring on unknown fields."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key in DEPRECATED_FIELDS:
            warnings.warn(f"dropping deprecated config field {key!r}")
            continue
        if key not in fields:
            raise ValueError(f"unknown config field {cls.__name__}.{key}")
        if isinstance(value, dict):
            sub_cls = _NESTED_TYPES.get(key)
            if sub_cls is None:
                raise ValueError(f"no schema for nested field {key!r}")
            kwargs[key] = _from_dict(sub_cls, value)
        else:
            kwargs[key] = _coerce(cls, key, value)
    return cls(**kwargs)


def _parse_scalar(text: str):
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def apply_dotlist(config, overrides: Sequence[str]):
    """'a.b.c=value' overrides, applied in order (reference: train.py:321-323)."""
    for item in overrides:
        path, _, raw = item.partition("=")
        keys = path.strip().split(".")
        value = _parse_scalar(raw)
        obj = config
        for k in keys[:-1]:
            obj = getattr(obj, k)
            if obj is None:
                raise ValueError(f"cannot override through unset field {k!r} in {item}")
        if not hasattr(obj, keys[-1]):
            raise ValueError(f"unknown override target {path!r}")
        setattr(obj, keys[-1], value)
    return config


def load_config(path: str, overrides: Sequence[str] = ()) -> TrainingConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    config = _from_dict(TrainingConfig, raw)
    return apply_dotlist(config, overrides)


def save_config(config: TrainingConfig, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(config), f, sort_keys=False)


def check_saved_config(config: TrainingConfig, saved: TrainingConfig):
    """Resume compatibility: step widths must match
    (reference: utils/config_utils.py:103-108)."""
    if saved.step_width != config.step_width:
        raise ValueError(
            f"checkpoint step_width {saved.step_width} != config {config.step_width}"
        )
