from emotts.nn.blocks import (
    ConvFFN,
    FFTBlock,
    FFTStack,
    MultiHeadSelfAttention,
    PositionalEncoding,
    attention_bias_from_mask,
    sequence_mask,
    sinusoidal_positional_encoding,
)
from emotts.nn.intensity import IntensityExtractor, RankModel

__all__ = [
    "ConvFFN",
    "FFTBlock",
    "FFTStack",
    "MultiHeadSelfAttention",
    "PositionalEncoding",
    "attention_bias_from_mask",
    "sequence_mask",
    "sinusoidal_positional_encoding",
    "IntensityExtractor",
    "RankModel",
]
