"""Sharded detection + digest reduction over a JAX device mesh.

The TPU-native counterpart of the reference's rayon data parallelism
(SURVEY.md §2.4): every message is independent (``README.md:10``), so

* clues are sharded over the ``data`` mesh axis (the reference shards over
  threads via ``par_iter``, ``examples/omr.rs:160-164``);
* the detection key (BSK1/KSK/BSK2/TraceKey) is replicated — it is read-only
  per message;
* digest accumulation is an exact modular sum, reduced across shards with
  ``jax.lax.psum`` — the collective replacing the rayon tree-reduce at
  reference ``detector.rs:333-336,445-449``.

Because the reduction is exact modular addition, sharded digests are
bit-identical to single-device digests (tested in tests/test_parallel.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tfhe_omr_tpu.core.detector import Detector
from tfhe_omr_tpu.core.sender import ClueBatch


def make_data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


class ShardedDetector:
    """Runs a Detector's programs under ``shard_map`` over a data mesh."""

    def __init__(self, detector: Detector, mesh: Mesh, axis_name: str = "data"):
        self.detector = detector
        self.mesh = mesh
        self.axis = axis_name
        self.n_dev = mesh.devices.size
        f2 = detector.ctx.f2
        # replicate the (read-only) detection key across the mesh — the TPU
        # equivalent of rayon threads sharing the key by reference
        self.key = jax.device_put(
            detector.key, NamedSharding(mesh, P())
        )

        self._detect_sharded = jax.jit(
            shard_map(
                detector._detect_fn,
                mesh=mesh,
                in_specs=(P(axis_name), P(axis_name), P()),
                out_specs=P(axis_name),
                check_rep=False,
            )
        )

        def encode_shard(pert, plain):
            """Local MAC-sum then exact modular psum across shards."""
            ctx = detector.ctx
            pn = ctx.ntt2.fwd(plain.T)
            prod = f2.mul(pert.transpose(1, 2, 0), pn[None])
            local = f2.mod_sum(prod, axis=2)
            # psum of values < q over n_dev shards stays < n_dev * q < 2**62
            total = jax.lax.psum(local, axis_name)
            return f2.reduce(total, f2.bits + self.n_dev.bit_length() + 1)

        self._encode_sharded = jax.jit(
            shard_map(
                encode_shard,
                mesh=mesh,
                in_specs=(P(axis_name), P(axis_name)),
                out_specs=P(),
                check_rep=False,
            )
        )

    # ----------------------------------------------------------------- api
    def pad(self, count: int) -> int:
        """Messages per shard-aligned batch."""
        d = self.n_dev
        return -(-count // d) * d

    def detect(self, clues: ClueBatch) -> jnp.ndarray:
        """Sharded batched detection; batch must divide evenly by #devices."""
        bsz = clues.a.shape[0]
        assert bsz % self.n_dev == 0, (bsz, self.n_dev)
        sh = NamedSharding(self.mesh, P(self.axis))
        a = jax.device_put(jnp.asarray(clues.a), sh)
        b7 = jax.device_put(jnp.asarray(clues.b7), sh)
        return self._detect_sharded(a, b7, self.key)

    def encode_chunk(self, pertinency, plain):
        """Digest chunk accumulation with psum reduce; returns (2, N2)."""
        sh = NamedSharding(self.mesh, P(self.axis))
        pert = jax.device_put(jnp.asarray(pertinency), sh)
        pl = jax.device_put(jnp.asarray(plain), sh)
        return self._encode_sharded(pert, pl)
