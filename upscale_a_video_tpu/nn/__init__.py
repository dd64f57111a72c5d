from .blocks import (
    InflatedConv,
    TemporalConv,
    Upsample3D,
    Downsample3D,
    ResnetBlock3D,
    ResnetBlock3DCNN,
    ResnetBlock3DPlus,
    FuseSFTBlock,
    TimestepEmbedding,
)
from .attention import (
    CrossAttention,
    TemporalAttention,
    BasicTransformerBlock,
    Transformer3DModel,
    SpatialAttentionBlock,
    SparseCausalAttention,
    FeedForward,
)
from .temporal import TemporalModule3D, TemporalModule3DVAE
from .temporal_transformer import (
    AdaLayerNorm,
    TemporalTransformer3DModel,
    VersatileSelfAttention,
    WarpModule,
)

__all__ = [
    "InflatedConv",
    "TemporalConv",
    "Upsample3D",
    "Downsample3D",
    "ResnetBlock3D",
    "ResnetBlock3DCNN",
    "ResnetBlock3DPlus",
    "FuseSFTBlock",
    "TimestepEmbedding",
    "CrossAttention",
    "TemporalAttention",
    "BasicTransformerBlock",
    "Transformer3DModel",
    "SpatialAttentionBlock",
    "FeedForward",
    "TemporalModule3D",
    "TemporalModule3DVAE",
]
