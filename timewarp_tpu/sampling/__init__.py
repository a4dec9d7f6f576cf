from timewarp_tpu.sampling.mh import (
    MHConfig,
    MHState,
    SegmentOutputs,
    make_flow_proposal,
    mh_segment,
    sample_with_model,
)
from timewarp_tpu.sampling.chain_stats import ChainStats

__all__ = [
    "MHConfig",
    "MHState",
    "SegmentOutputs",
    "make_flow_proposal",
    "mh_segment",
    "sample_with_model",
    "ChainStats",
]
