from .normalize import L2Norm, RMSNorm, SwishLayerNorm, T5LayerNorm
from .embedding import SemIdEmbedding, UserIdEmbedding
from .mlp import MLP
from .encoder import LightTextEncoder, PretrainedTextEncoder
from .transformer import (FeedForward, T5Attention, TransformerBlock,
                          TransformerDecoder, TransformerEncoder,
                          TransformerEncoderDecoder, causal_mask,
                          relative_position_bucket)

__all__ = [
    "L2Norm", "RMSNorm", "SwishLayerNorm", "T5LayerNorm",
    "SemIdEmbedding", "UserIdEmbedding", "MLP",
    "FeedForward", "T5Attention", "TransformerBlock", "TransformerDecoder",
    "TransformerEncoder", "TransformerEncoderDecoder", "causal_mask",
    "relative_position_bucket",
]
