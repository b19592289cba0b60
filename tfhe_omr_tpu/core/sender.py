"""Sender: batched clue generation.

Counterpart of reference ``omr_core/src/sender.rs`` + ``key_gen/clue.rs``:
``gen_clues`` encrypts ``clue_count`` zeros into one compact ciphertext
(``clue.rs:26-34`` via ``LwePublicKeyRlweMode::encrypt_multi_messages``).

TPU-first difference: clues for a whole batch of messages are generated with
one integer matmul per key (the compact ciphertext is (a(X), b[0..7)) where
a = u*pk_a + e_a and b = u*pk_b + e_b with binary u), instead of the
reference's per-message rayon loop (``examples/omr.rs:126-135``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from tfhe_omr_tpu.core.keygen import ClueKey
from tfhe_omr_tpu.core.params import OmrParameters


class ClueBatch(NamedTuple):
    """Compact multi-message LWE ciphertexts for a batch of messages.

    Counterpart of ``CmLweCiphertext<u16>``: ring mask ``a`` (B, n0) plus the
    ``clue_count`` masked coefficients ``b7`` (B, clue_count), mod q0.
    """

    a: np.ndarray
    b7: np.ndarray

    @staticmethod
    def concat(batches):
        return ClueBatch(
            np.concatenate([x.a for x in batches]),
            np.concatenate([x.b7 for x in batches]),
        )


class Sender:
    def __init__(self, clue_key: ClueKey, params: OmrParameters):
        self.clue_key = clue_key
        self.params = params

    def gen_clues(self, count: int, rng: np.random.Generator) -> ClueBatch:
        """Encrypt ``count`` all-zero clue vectors under this sender's key."""
        k = self.clue_key
        n = k.mat_a.shape[0]
        q0 = k.q0
        u = rng.integers(0, 2, size=(count, n), dtype=np.int64)
        e_a = np.rint(rng.normal(0, k.noise_std, size=(count, n))).astype(np.int64)
        e_b = np.rint(
            rng.normal(0, k.noise_std, size=(count, k.clue_count))
        ).astype(np.int64)
        a = np.mod(u @ k.mat_a + e_a, q0)
        b7 = np.mod(u @ k.mat_b7 + e_b, q0)
        # messages are all zero -> no Delta*m term (``clue.rs:27-34``)
        return ClueBatch(a=a, b7=b7)

    def clue_key_size(self) -> int:
        """Bytes of the public key (counterpart of ``Size`` accounting)."""
        n = self.clue_key.mat_a.shape[0]
        return 2 * n * 2  # (pk_a, pk_b) of u16 coefficients
