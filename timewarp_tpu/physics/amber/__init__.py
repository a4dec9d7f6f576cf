from timewarp_tpu.physics.amber.build import build_system

__all__ = ["build_system"]
