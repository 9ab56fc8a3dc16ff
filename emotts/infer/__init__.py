from emotts.infer.bucketize import bucketize, compute_intensity_prototypes
from emotts.infer.synthesize import (
    Synthesizer,
    load_synthesizer,
    load_vocoder_checkpoint,
    save_vocoder_params_npz,
)

__all__ = [
    "bucketize",
    "compute_intensity_prototypes",
    "Synthesizer",
    "load_synthesizer",
    "load_vocoder_checkpoint",
    "save_vocoder_params_npz",
]
