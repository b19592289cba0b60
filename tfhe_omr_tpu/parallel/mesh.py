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
        self._enc_cache = {}

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

    def _shard(self, x):
        return jax.device_put(
            jnp.asarray(x), NamedSharding(self.mesh, P(self.axis))
        )

    def detect(self, clues: ClueBatch) -> jnp.ndarray:
        """Sharded batched detection. Ragged batches are zero-padded to a
        shard-aligned size and the padding rows sliced off (zero clues are
        valid ciphertexts, so padding only costs compute)."""
        bsz = clues.a.shape[0]
        padded = self.pad(bsz)
        a, b7 = np.asarray(clues.a), np.asarray(clues.b7)
        if padded != bsz:
            a = np.concatenate(
                [a, np.zeros((padded - bsz, a.shape[1]), a.dtype)]
            )
            b7 = np.concatenate(
                [b7, np.zeros((padded - bsz, b7.shape[1]), b7.dtype)]
            )
        out = self._detect_sharded(self._shard(a), self._shard(b7), self.key)
        return out[:bsz] if padded != bsz else out

    def encode_chunk(self, pertinency, plain):
        """Digest chunk accumulation with psum reduce; returns (2, N2)."""
        return self._encode_sharded(
            self._shard(pertinency), self._shard(plain)
        )

    # ------------------------------------------------- full digest encoders
    def _idx_chunk_fn(self, nd: int, segs: int):
        """Sharded twin of Detector's encode_idx_chunk (cached per layout)."""
        key = ("idx", nd, segs)
        fn = self._enc_cache.get(key)
        if fn is not None:
            return fn
        from tfhe_omr_tpu.core.detector import index_poly_device

        det = self.detector
        f2 = det.ctx.f2
        ntt2 = det.ctx.ntt2
        idx_p = det.ctx.params.output_plain_modulus
        q2 = f2.q
        axis = self.axis
        nbits = f2.bits + self.n_dev.bit_length() + 1

        def chunk(pert, base_addr, idx, acc):
            poly = index_poly_device(
                base_addr, idx, nd, segs, pert.shape[2], idx_p, q2
            )
            pn = ntt2.fwd(poly.T)
            prod = f2.mul(pert.transpose(1, 2, 0), pn[None])
            local = f2.mod_sum(prod, axis=2)
            total = f2.reduce(jax.lax.psum(local, axis), nbits)
            return f2.add(acc, total)

        fn = jax.jit(
            shard_map(
                chunk,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis), P(self.axis), P()),
                out_specs=P(),
                check_rep=False,
            )
        )
        self._enc_cache[key] = fn
        return fn

    def _pay_chunk_fn(self, kct: int, cmb: int, plen: int):
        key = ("pay", kct, cmb, plen)
        fn = self._enc_cache.get(key)
        if fn is not None:
            return fn
        from tfhe_omr_tpu.core.detector import payload_plain_device

        det = self.detector
        f2 = det.ctx.f2
        ntt2 = det.ctx.ntt2
        idx_p = det.ctx.params.output_plain_modulus
        q2 = f2.q
        axis = self.axis
        nbits = f2.bits + self.n_dev.bit_length() + 1

        def chunk(pert, payloads, weights, accs):
            pert_t = pert.transpose(1, 2, 0)
            out = []
            for k in range(kct):
                plain = payload_plain_device(
                    payloads, weights[k], plen, pert.shape[2], idx_p, q2
                )
                pn = ntt2.fwd(plain.T)
                prod = f2.mul(pert_t, pn[None])
                local = f2.mod_sum(prod, axis=2)
                total = f2.reduce(jax.lax.psum(local, axis), nbits)
                out.append(f2.add(accs[k], total))
            return jnp.stack(out)

        fn = jax.jit(
            shard_map(
                chunk,
                mesh=self.mesh,
                in_specs=(
                    P(self.axis),
                    P(self.axis),
                    P(None, None, self.axis),
                    P(),
                ),
                out_specs=P(),
                check_rep=False,
            )
        )
        self._enc_cache[key] = fn
        return fn

    def _pad_pert(self, pert, s: int, c: int, chunk: int):
        """Chunk rows [s, s+c) of the pertinency stack, zero-padded to the
        shard-aligned chunk size — a zero pertinency ciphertext contributes
        exactly zero to the digest MAC, so padding is exact."""
        block = pert[s : s + c]
        if c == chunk:
            return block
        pad = jnp.zeros((chunk - c,) + tuple(block.shape[1:]), block.dtype)
        return jnp.concatenate([block, pad], axis=0)

    def encode_pertinent_indices(self, retrieval_params, pertinency, rng,
                                 chunk: int = 2048):
        """Sharded twin of ``Detector.encode_pertinent_indices`` — same rng
        stream, psum digest reduce (reference ``detector.rs:223-339``)."""
        rp = retrieval_params
        chunk = self.pad(chunk)
        total = pertinency.shape[0]
        acc = jnp.zeros((2, rp.polynomial_size), dtype=jnp.int64)
        fn = self._idx_chunk_fn(
            rp.index_slots_per_bucket, rp.segment_per_cipher
        )
        for s in range(0, total, chunk):
            c = min(chunk, total - s)
            buckets = rng.integers(
                0, rp.bucket_count_per_segment,
                size=(c, rp.segment_per_cipher), dtype=np.int64,
            )
            base_addr = (
                np.arange(rp.segment_per_cipher, dtype=np.int64)[None, :]
                * rp.slots_per_segment
                + buckets * rp.slots_per_bucket
            )
            if c != chunk:
                base_addr = np.concatenate(
                    [base_addr, np.zeros((chunk - c, base_addr.shape[1]),
                                         np.int64)]
                )
            idx = np.arange(s, s + chunk, dtype=np.int64)
            acc = fn(
                self._shard(self._pad_pert(pertinency, s, c, chunk)),
                self._shard(base_addr),
                self._shard(idx),
                acc,
            )
        return acc

    def encode_pertinent_payloads(self, retrieval_params, pertinency,
                                  payloads, seed, chunk: int = 2048):
        """Sharded twin of ``Detector.encode_pertinent_payloads`` (reference
        ``detector.rs:341-453``); the rayon tree-reduce at ``:445-449``
        becomes the psum inside the chunk program."""
        from tfhe_omr_tpu.core.detector import sample_weights

        rp = retrieval_params
        chunk = self.pad(chunk)
        total = pertinency.shape[0]
        weights = sample_weights(rp, seed)
        w_all = weights.reshape(
            rp.cmb_cipher_count, rp.cmb_count_per_cipher, -1
        )
        accs = jnp.zeros(
            (rp.cmb_cipher_count, 2, rp.polynomial_size), dtype=jnp.int64
        )
        fn = self._pay_chunk_fn(
            rp.cmb_cipher_count, rp.cmb_count_per_cipher, rp.payload_length
        )
        plen = payloads.shape[1]
        for s in range(0, total, chunk):
            c = min(chunk, total - s)
            pl = np.asarray(payloads[s : s + c], dtype=np.int64)
            wc = w_all[:, :, s : s + c]
            if c != chunk:
                pl = np.concatenate(
                    [pl, np.zeros((chunk - c, plen), np.int64)]
                )
                wc = np.concatenate(
                    [wc, np.zeros(wc.shape[:2] + (chunk - c,), np.int64)],
                    axis=2,
                )
            accs = fn(
                self._shard(self._pad_pert(pertinency, s, c, chunk)),
                self._shard(pl),
                jax.device_put(
                    jnp.asarray(wc),
                    NamedSharding(self.mesh, P(None, None, self.axis)),
                ),
                accs,
            )
        return accs
