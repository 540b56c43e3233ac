from deepvcp_tpu.models.deepvcp import DeepVCP, create_deepvcp
from deepvcp_tpu.models.extra_layers import FeaturePropagation, SetAbstractionMSG
from deepvcp_tpu.models.fused_sa import BandedSetAbstraction
from deepvcp_tpu.models.layers import (
    CPG,
    FeatEmbedding,
    FeatureExtraction,
    SetAbstraction,
    WeightingLayer,
)

__all__ = [
    "DeepVCP",
    "create_deepvcp",
    "SetAbstraction",
    "BandedSetAbstraction",
    "SetAbstractionMSG",
    "FeaturePropagation",
    "FeatureExtraction",
    "WeightingLayer",
    "FeatEmbedding",
    "CPG",
]
