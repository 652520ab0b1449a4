from cabinet_tpu.models.cab import (
    ContextAggregationBlock,
    GlobalContextAttention,
    LocalAttention,
    PSPModule,
)
from cabinet_tpu.models.cabinet import (
    AttentionBranch,
    CABiNet,
    CABiNetOutput,
    FeatureFusionModule,
    SpatialBranch,
    build_cabinet,
)
from cabinet_tpu.models.fused import (
    fused_early_supported,
    make_fused_apply,
    make_fused_tail_apply,
)
from cabinet_tpu.models.layers import (
    ConvBNReLU,
    DepthwiseConv,
    DepthwiseSeparableConv,
    DWConv,
    SELayer,
    hard_sigmoid,
    hard_swish,
    make_divisible,
)
from cabinet_tpu.models.mobilenetv3 import (
    MOBILENETV3_LARGE_CFGS,
    MOBILENETV3_SMALL_CFGS,
    MobileNetV3,
)

__all__ = [
    "AttentionBranch",
    "CABiNet",
    "CABiNetOutput",
    "ContextAggregationBlock",
    "ConvBNReLU",
    "DWConv",
    "DepthwiseConv",
    "DepthwiseSeparableConv",
    "FeatureFusionModule",
    "GlobalContextAttention",
    "LocalAttention",
    "MOBILENETV3_LARGE_CFGS",
    "MOBILENETV3_SMALL_CFGS",
    "MobileNetV3",
    "PSPModule",
    "SELayer",
    "SpatialBranch",
    "build_cabinet",
    "fused_early_supported",
    "hard_sigmoid",
    "hard_swish",
    "make_divisible",
    "make_fused_apply",
    "make_fused_tail_apply",
]
