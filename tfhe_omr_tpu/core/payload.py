"""Payload representation (counterpart of reference ``omr_core/src/payload.rs``).

The reference fixes ``PAYLOAD_LENGTH = 612`` u16 elements
(``payload.rs:8-10``); here payloads are rows of a ``(D, payload_length)``
int64 numpy array (batched, TPU-friendly), with the length a parameter
defaulting to the reference value. Payload bytes are sampled in [0, 256) and
all arithmetic happens mod the output plain modulus p (reference
``payload.rs:53-103`` implements add/sub/mul_scalar under a ``RingReduce``
modulus; here those are plain vectorised numpy expressions at the call sites).
"""

from __future__ import annotations

import numpy as np

#: Reference payload length (``omr_core/src/payload.rs:8``).
PAYLOAD_LENGTH = 612


def random_payloads(
    rng: np.random.Generator, count: int, length: int = PAYLOAD_LENGTH
) -> np.ndarray:
    """Random byte payloads, shape (count, length) int64 in [0, 256).

    Counterpart of ``Payload::random`` (reference ``payload.rs:26-38``), which
    fills from random *bytes* (hence [0,256) even when p = 257).
    """
    return rng.integers(0, 256, size=(count, length), dtype=np.int64)
