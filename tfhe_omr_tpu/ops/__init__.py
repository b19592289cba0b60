"""Device-side lattice primitives (L0/L1 of the reference layer map).

TPU-native counterparts of the external ``primus-fhe`` crates the reference
depends on (``algebra``/``lattice``/``fhe_core``; see SURVEY.md §2.2). All
semantics are pinned by the reference call sites cited in each module.
"""

from tfhe_omr_tpu.ops.modmath import PrimeField
from tfhe_omr_tpu.ops.ntt import NegacyclicNtt

__all__ = ["PrimeField", "NegacyclicNtt"]
