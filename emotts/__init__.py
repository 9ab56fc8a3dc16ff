"""emotts — a TPU-native (JAX/XLA/Pallas/pjit) framework for fine-grained
emotional control of text-to-speech.

Re-designed from scratch for TPU hardware with the same capability surface as
the PyTorch reference ``Orca0917/fine-grained-emotional-control-of-tts``
(mounted read-only at /root/reference; see SURVEY.md for the inventory):

* ``emotts.audio``  — feature frontend: fused STFT→mel→energy (XLA matmuls),
  WORLD-style DIO+StoneMask F0, TextGrid/duration ingestion, normalization.
* ``emotts.text``   — text cleaners, ARPABET vocabulary, lexicon/rule G2P.
* ``emotts.nn``     — Flax modules: FFT blocks, variance adaptors, length
  regulator, IntensityExtractor/RankModel, FastSpeech2, HiFi-GAN.
* ``emotts.losses`` — rank loss (mixup CE + RankNet BCE) and the FastSpeech2
  composite loss (vectorized masked MSEs + SSIM).
* ``emotts.data``   — bucketed, statically-shaped host input pipeline.
* ``emotts.train``  — jitted train steps, optax optimizers, Orbax checkpoints.
* ``emotts.infer``  — intensity bucketizer and the synthesis pipeline.
* ``emotts.parallel`` — device-mesh / sharding utilities (DP over ICI).
* ``emotts.ops``    — Pallas TPU kernels for the hot paths.
* ``emotts.cli``    — entry points mirroring the reference scripts
  (prepare_corpus, preprocess, train_rank, bucketize, train_fs2, synthesize).
"""

__version__ = "0.1.0"
