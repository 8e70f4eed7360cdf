"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup (axon TPU
tunnel), so plain env vars are too late — we must override via jax.config.
XLA_FLAGS still applies because the CPU backend initializes lazily.

Set MLX_AUDIO_TPU_TESTS=1 to SKIP the CPU override and run the selected
tests on the real chip instead (used by `scripts/tpu_smoke.py --all` to
prove every model family compiles + executes on actual TPU hardware).
"""

import os

_ON_TPU = os.environ.get("MLX_AUDIO_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _seed_init_rng(request):
    """Weight init draws from a shared global counter (nn.layers._KEY), so a
    module's model weights would otherwise depend on every module that ran
    before it — making near-tie assertions order-dependent. Reseed per
    module for order independence. The GLOBAL numpy RNG is reseeded too:
    tests drawing inputs via np.random.* otherwise get different inputs in
    a full-suite run than in isolation (root cause of the round-1
    test_cosyvoice3 order-dependent failure: shifted np.random state fed a
    tiny random LM inputs that sampled EOS at step 0)."""
    import zlib

    import numpy as _np

    from mlx_audio_tpu.nn import seed_rng

    # stable across processes (str hash() is randomized per interpreter)
    seed = zlib.crc32(request.module.__name__.encode()) % (2**31)
    seed_rng(seed)
    _np.random.seed(seed)
    yield
    # Release compiled executables between modules: a single-process run of
    # the whole suite otherwise accumulates >12 GB of jit caches and the
    # XLA CPU compiler eventually segfaults under memory pressure.
    jax.clear_caches()
