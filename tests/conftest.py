"""Test harness: force CPU with a virtual 8-device mesh (SURVEY.md §4).

The container's sitecustomize (/root/.axon_site) imports jax and registers
the remote-TPU 'axon' PJRT plugin in every Python process *before* pytest
conftests run, and the environment pins JAX_PLATFORMS=axon.  Env vars are
therefore too late here — use jax.config.update, which takes effect at
backend initialisation (first op), to keep tests on the local CPU.
"""

import gc
import os
import sys

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache_rss():
    """Release compiled executables between test modules so one pytest
    process stays under ~10 GB RSS (the round-2 full-suite run OOM-crashed
    at ~9 GB with every module's jitted programs resident)."""
    yield
    jax.clear_caches()
    gc.collect()
