"""Multi-host launch helper.

The reference is single-process (rayon shared memory; SURVEY.md §2.4). The
TPU-native plan scales the same data-parallel program across hosts with the
JAX multi-controller runtime: every host runs the identical script, clues are
sharded over the global ``data`` mesh axis, the detection key is replicated,
and the digest ``psum`` rides ICI within a slice and DCN across hosts — no
application-level communication code is needed beyond the mesh.

Typical use on each host of a multi-host slice::

    from tfhe_omr_tpu.parallel import distributed
    distributed.init()          # jax.distributed.initialize()
    mesh = make_data_mesh()     # now spans all hosts' devices
    sharded = ShardedDetector(detector, mesh)
"""

from __future__ import annotations

import jax


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> int:
    """Initialise the JAX multi-controller runtime (no-op if single-host).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly for manual bring-up. Returns the global device count.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            # single-process environments (no cluster env vars) — fine
            pass
    return len(jax.devices())


def is_multihost() -> bool:
    return jax.process_count() > 1
