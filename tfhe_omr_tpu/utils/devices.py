"""Device-placement helpers.

Key generation and table construction are many small eager ops; on a
networked TPU backend every eager op would trigger its own remote
compilation. All host-side math therefore runs pinned to the CPU backend
(``host_math``), and finished key material is shipped to the accelerator
once (``to_accelerator``).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


def cpu_device():
    # local_devices, not devices: in a multi-controller run jax.devices()
    # leads with process 0's devices, which are non-addressable elsewhere
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.local_devices()[0]


def accelerator_device():
    """The default local compute device (TPU when present, else CPU)."""
    return jax.local_devices()[0]


@contextmanager
def host_math():
    """Run eager jnp math on the CPU backend (fast dispatch, no remote
    compiles)."""
    with jax.default_device(cpu_device()):
        yield


def to_accelerator(tree):
    """Move a pytree of arrays to the accelerator in one transfer each."""
    dev = accelerator_device()
    return jax.device_put(tree, dev)
