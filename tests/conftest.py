"""Test configuration: force the CPU backend (8 virtual devices).

Note: this environment pre-sets JAX_PLATFORMS=axon,cpu and the axon TPU
plugin re-asserts it during import, so the env var alone is not enough — the
config must be updated after importing jax. XLA_FLAGS must still be set
before the CPU client initialises to get the virtual device mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the hardware tier (pytest -m tpu with TFHE_OMR_TPU_TESTS=1) keeps the real
# accelerator backend; everything else runs on the virtual CPU mesh
if os.environ.get("TFHE_OMR_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_params():
    from tfhe_omr_tpu.core.params import OmrParameters

    return OmrParameters.tiny()


@pytest.fixture(scope="session")
def tiny_ctx(tiny_params):
    from tfhe_omr_tpu.core.context import OmrContext

    return OmrContext(tiny_params)


@pytest.fixture(scope="session")
def tiny_skp(tiny_params, tiny_ctx):
    from tfhe_omr_tpu.core.keygen import SecretKeyPack

    return SecretKeyPack(tiny_params, rng=12345, ctx=tiny_ctx)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
