"""Checkpoint/resume of progressive renders (SURVEY.md §5.4).

The reference has no checkpointing — a killed render loses everything; its
live renderer's (buffer, num_samples) pair is the implicit resumable state
(src/renderer.rs:97-117). Here that state is explicit and serialized:
(accumulated mean, sample count, RNG seed) -> .npz.
"""

from __future__ import annotations

import numpy as np

from ..renderer import ProgressiveState


def save(path: str, state: ProgressiveState) -> None:
    np.savez_compressed(path, accum=state.accum,
                        num_samples=np.int64(state.num_samples),
                        seed=np.int64(state.seed))


def load(path: str) -> ProgressiveState:
    with np.load(path) as z:
        return ProgressiveState(accum=z["accum"].copy(),
                                num_samples=int(z["num_samples"]),
                                seed=int(z["seed"]))
