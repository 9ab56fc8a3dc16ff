from emotts.ops.mrf import fused_mrf_stage, mrf_reference
from emotts.ops.polyphase import (
    pack_conv_weights,
    pack_time,
    packed_conv,
    packed_resblock1,
    subpixel_conv_transpose,
    unpack_time,
)
from emotts.ops.resblock import block_halo, fused_resblock1, resblock1_reference

__all__ = [
    "block_halo",
    "fused_mrf_stage",
    "fused_resblock1",
    "mrf_reference",
    "pack_conv_weights",
    "pack_time",
    "packed_conv",
    "packed_resblock1",
    "resblock1_reference",
    "subpixel_conv_transpose",
    "unpack_time",
]
