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
from emotts.nn.fastspeech2 import EncoderPreNet, FastSpeech2, PostNet, VariancePredictor
from emotts.nn.intensity import IntensityExtractor, RankModel
from emotts.nn.length_regulator import (
    average_over_durations,
    length_regulate,
    phone_index_map,
    segment_mean,
)

__all__ = [
    "ConvFFN",
    "FFTBlock",
    "FFTStack",
    "MultiHeadSelfAttention",
    "PositionalEncoding",
    "attention_bias_from_mask",
    "sequence_mask",
    "sinusoidal_positional_encoding",
    "EncoderPreNet",
    "FastSpeech2",
    "PostNet",
    "VariancePredictor",
    "IntensityExtractor",
    "RankModel",
    "average_over_durations",
    "length_regulate",
    "phone_index_map",
    "segment_mean",
]
