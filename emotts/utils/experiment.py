"""Experiment-directory management and determinism helpers.

Capability parity with the reference's utils (rank_model/util.py:102-119 and
fastspeech2/util.py:90-100): auto-incrementing ``exp_N`` directories and a
single seeding entry point.  JAX is deterministic by construction given a
PRNG key; ``set_seed`` covers the host-side numpy/python RNGs used by the
data pipeline and split builders.
"""

from __future__ import annotations

import os
import random
from pathlib import Path

import numpy as np


def set_seed(seed: int = 42) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def increment_path(base_path: str, subdirs: tuple = ()) -> str:
    """Create and return the next free ``<base_path>/exp_N`` directory.

    Mirrors the reference behavior (rank_model/util.py:112-119); ``subdirs``
    reproduces fastspeech2/util.py:90-100 which also creates wavs/ and mels/.
    """
    exp_num = 1
    while True:
        path = Path(base_path) / f"exp_{exp_num}"
        if not path.exists():
            path.mkdir(parents=True)
            for sub in subdirs:
                (path / sub).mkdir()
            return str(path)
        exp_num += 1
