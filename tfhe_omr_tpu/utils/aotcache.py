"""On-disk cache of LOWERED (exported) jit programs.

The persistent XLA compilation cache only skips the backend *compile*: a
fresh process must still trace + lower a program to compute the cache key,
and lowering the big fused-kernel stage programs is expensive host CPU work
(the L2 blind-rotation program traces ~250 s on this 2-core host — see
docs/PERF_NOTES.md round-3 cold start). This module caches the serialized
``jax.export`` artifact (StableHLO + Mosaic payloads) keyed by code
fingerprint + backend + input avals, so later processes deserialize in
milliseconds and jump straight to the (also cached) executable load.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import tempfile

import jax

_FP = None


def code_fingerprint() -> str:
    """Hash of every .py source in the package — any code change invalidates
    cached lowered programs (conservative but safe)."""
    global _FP
    if _FP is None:
        h = hashlib.sha256()
        root = pathlib.Path(__file__).resolve().parent.parent
        for p in sorted(root.rglob("*.py")):
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
        _FP = h.hexdigest()[:16]
    return _FP


def _sig(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            parts.append(f"{leaf.shape}:{leaf.dtype}")
        else:  # static python values (e.g. jit static_argnums) by VALUE
            parts.append(repr(leaf))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def default_cache_dir() -> str:
    d = os.environ.get(
        "TFHE_OMR_AOT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tfhe_omr_aot"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def cached_export(name: str, jit_fn, sample_args, cache_dir: str | None = None,
                  extra: str = ""):
    """A jitted callable for ``jit_fn`` specialized to ``sample_args``'
    avals, loading the lowered program from disk when available.

    ``sample_args`` may be (pytrees of) ``jax.ShapeDtypeStruct`` — no real
    data needed. Returns ``(callable, "hit"|"miss")``.

    ``extra`` must carry every configuration value the traced program bakes
    in as a constant but that is NOT visible in the input avals — e.g. a
    canonical serialization of the cryptographic parameter set (moduli,
    gadget config, offsets). Two parameter sets with identical array
    shapes/dtypes would otherwise silently share cached executables and
    produce wrong ciphertexts.
    """
    from jax import export as jexport

    if cache_dir is None:
        cache_dir = default_cache_dir()
    dev = jax.devices()[0]
    key = "-".join(
        [
            name,
            jax.__version__,
            jax.default_backend(),
            getattr(dev, "device_kind", "?").replace(" ", "_"),
            code_fingerprint(),
            hashlib.sha256(extra.encode()).hexdigest()[:12],
            _sig(sample_args),
        ]
    )
    path = os.path.join(cache_dir, f"{key}.jaxexp")
    if os.path.exists(path):
        with open(path, "rb") as f:
            exp = jexport.deserialize(f.read())
        return jax.jit(exp.call), "hit"
    exp = jexport.export(jit_fn)(*sample_args)
    data = exp.serialize()
    fd, tmp = tempfile.mkstemp(dir=cache_dir)
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return jax.jit(exp.call), "miss"


class ShapeDispatched:
    """Routes calls matching the AOT-prepared aval signature to the exported
    program; anything else falls back to the original jit function.

    ``static_argnums``: positions the original jit treats as static —
    export bakes their values in, so the AOT call receives only the
    dynamic arguments (the signature match still covers the static VALUES,
    so a different static config falls back and retraces).
    """

    def __init__(self, base_jit, aot_call, sample_args, static_argnums=()):
        self._base = base_jit
        self._aot = aot_call
        self._sig = _sig(sample_args)
        self._static = frozenset(static_argnums)

    def __call__(self, *args, **kwargs):
        # kwarg-carrying calls can't be signature-matched positionally;
        # route them to the base jit instead of raising
        if not kwargs and _sig(args) == self._sig:
            dyn = [a for i, a in enumerate(args) if i not in self._static]
            return self._aot(*dyn)
        return self._base(*args, **kwargs)

    def lower(self, *args):  # probes/AOT tooling reach the original
        return self._base.lower(*args)
