"""Model zoo constructor.

Dispatches over the reference's model_type strings
(reference: model_configs.py:14-24, model_constructor.py:51-254) and builds
flax modules. Coupling flows alternate positions/velocities layers
controlled by ``position_layer_index_mod_2``.
"""
import dataclasses
from typing import Optional, Sequence

from timewarp_tpu.models.baselines import (
    EulerMaruyamaGaussian,
    InitialStateGaussian,
    InitialStatePointEstimate,
    LearnableLinearGaussian,
)
from timewarp_tpu.models.cvae import ConditionalVAEModel, TransformerCVAEConfig
from timewarp_tpu.models.flow import ConditionalFlowDensity
from timewarp_tpu.models.gaussian_density import (
    GaussianDensityModel,
    GaussianDensityTransformerConfig,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.models.layers.rff import RFFPositionEncoderConfig
from timewarp_tpu.models.layers.transformer import TransformerConfig
from timewarp_tpu.models.nvp import (
    CustomAttentionCouplingLayer,
    TransformerCouplingLayer,
)

MODEL_TYPES = (
    "transformer_nvp",
    "custom_attention_transformer_nvp",
    "equivariant_nvp",
    "transformer_cvae",
    "gaussian_density_transformer",
    "initial_state_gaussian",
    "learnable_linear_gaussian",
    "euler_maruyama_gaussian",
    "initial_state_point_estimate",
)


@dataclasses.dataclass
class ConditionalFlowDensityConfig:
    """Reference: modules/model_wrappers/flow.py:339-344."""

    scale_requires_grad: bool = True
    ignore_conditional_velocity: bool = False
    use_displacement_as_target: bool = True


@dataclasses.dataclass
class TransformerNVPConfig:
    atom_embedding_dim: int = 32
    transformer_hidden_dim: int = 128
    latent_mlp_hidden_dims: Sequence[int] = (256,)
    num_coupling_layers: int = 8
    num_transformer_layers: int = 3
    transformer_config: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )
    rff_position_encoder_config: Optional[RFFPositionEncoderConfig] = None
    position_layer_index_mod_2: int = 0
    conditional_flow_density: ConditionalFlowDensityConfig = dataclasses.field(
        default_factory=ConditionalFlowDensityConfig
    )


@dataclasses.dataclass
class CustomAttentionTransformerNVPConfig:
    atom_embedding_dim: int = 32
    latent_mlp_hidden_dims: Sequence[int] = (256,)
    num_coupling_layers: int = 8
    num_transformer_layers: int = 3
    encoder_layer_config: CustomAttentionEncoderConfig = dataclasses.field(
        default_factory=CustomAttentionEncoderConfig
    )
    position_layer_index_mod_2: int = 0
    conditional_flow_density: ConditionalFlowDensityConfig = dataclasses.field(
        default_factory=ConditionalFlowDensityConfig
    )


@dataclasses.dataclass
class EquivariantNVPConfig:
    """Reference: model_configs.py:40-45."""

    atom_embedding_dim: int = 32
    num_coupling_layers: int = 8
    latent_mlp_hidden_dims: Sequence[int] = (128,)
    position_layer_index_mod_2: int = 0
    conditional_flow_density: ConditionalFlowDensityConfig = dataclasses.field(
        default_factory=ConditionalFlowDensityConfig
    )


@dataclasses.dataclass
class ModelConfig:
    model_type: str = "custom_attention_transformer_nvp"
    transformer_nvp_config: Optional[TransformerNVPConfig] = None
    custom_transformer_nvp_config: Optional[CustomAttentionTransformerNVPConfig] = None
    transformer_cvae_config: Optional[TransformerCVAEConfig] = None
    equivariant_nvp_config: Optional[EquivariantNVPConfig] = None
    gaussian_density_transformer_config: Optional[GaussianDensityTransformerConfig] = None


def _flow(layer_factory, cfg, cfd: ConditionalFlowDensityConfig):
    return ConditionalFlowDensity(
        layer_factory=layer_factory,
        num_coupling_layers=cfg.num_coupling_layers,
        position_layer_index_mod_2=cfg.position_layer_index_mod_2,
        atom_embedding_dim=cfg.atom_embedding_dim,
        use_displacement_as_target=cfd.use_displacement_as_target,
        scale_learnable=cfd.scale_requires_grad,
        ignore_conditional_velocity=cfd.ignore_conditional_velocity,
    )


def build_transformer_nvp(cfg: TransformerNVPConfig) -> ConditionalFlowDensity:
    rff = cfg.rff_position_encoder_config or RFFPositionEncoderConfig(0, 1.0, 1.0)

    def factory(transformed_vars: str, name: str):
        return TransformerCouplingLayer(
            transformed_vars=transformed_vars,
            latent_dim=cfg.transformer_hidden_dim,
            mlp_hidden_dims=tuple(cfg.latent_mlp_hidden_dims),
            num_transformer_layers=cfg.num_transformer_layers,
            transformer_config=cfg.transformer_config,
            rff_config=rff,
            name=name,
        )

    return _flow(factory, cfg, cfg.conditional_flow_density)


def build_custom_attention_transformer_nvp(
    cfg: CustomAttentionTransformerNVPConfig,
) -> ConditionalFlowDensity:
    def factory(transformed_vars: str, name: str):
        return CustomAttentionCouplingLayer(
            transformed_vars=transformed_vars,
            encoder_config=cfg.encoder_layer_config,
            mlp_hidden_dims=tuple(cfg.latent_mlp_hidden_dims),
            num_transformer_layers=cfg.num_transformer_layers,
            separate_scales_per_dimension=True,
            name=name,
        )

    return _flow(factory, cfg, cfg.conditional_flow_density)


def build_equivariant_nvp(cfg: EquivariantNVPConfig) -> ConditionalFlowDensity:
    from timewarp_tpu.models.layers.equivariant import EquivariantCouplingLayer

    def factory(transformed_vars: str, name: str):
        return EquivariantCouplingLayer(
            transformed_vars=transformed_vars,
            features_dim=cfg.atom_embedding_dim,
            mlp_hidden_dims=tuple(cfg.latent_mlp_hidden_dims),
            name=name,
        )

    return _flow(factory, cfg, cfg.conditional_flow_density)


def build_model(config: ModelConfig):
    if config.model_type == "transformer_nvp":
        return build_transformer_nvp(config.transformer_nvp_config or TransformerNVPConfig())
    if config.model_type == "custom_attention_transformer_nvp":
        return build_custom_attention_transformer_nvp(
            config.custom_transformer_nvp_config or CustomAttentionTransformerNVPConfig()
        )
    if config.model_type == "equivariant_nvp":
        return build_equivariant_nvp(config.equivariant_nvp_config or EquivariantNVPConfig())
    if config.model_type == "transformer_cvae":
        return ConditionalVAEModel(config.transformer_cvae_config or TransformerCVAEConfig())
    if config.model_type == "gaussian_density_transformer":
        return GaussianDensityModel(
            config.gaussian_density_transformer_config or GaussianDensityTransformerConfig()
        )
    if config.model_type == "initial_state_gaussian":
        return InitialStateGaussian()
    if config.model_type == "learnable_linear_gaussian":
        return LearnableLinearGaussian()
    if config.model_type == "euler_maruyama_gaussian":
        return EulerMaruyamaGaussian()
    if config.model_type == "initial_state_point_estimate":
        return InitialStatePointEstimate()
    raise ValueError(f"Unknown model_type {config.model_type!r}")
