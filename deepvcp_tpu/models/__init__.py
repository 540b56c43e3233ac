from deepvcp_tpu.models.deepvcp import DeepVCP, create_deepvcp
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
    "FeatureExtraction",
    "WeightingLayer",
    "FeatEmbedding",
    "CPG",
]
