"""Test harness: force CPU with a virtual 8-device mesh (SURVEY.md §4).

The container's sitecustomize (/root/.axon_site) imports jax and registers
the remote-TPU 'axon' PJRT plugin in every Python process *before* pytest
conftests run, and the environment pins JAX_PLATFORMS=axon.  Env vars are
therefore too late here — use jax.config.update, which takes effect at
backend initialisation (first op), to keep tests on the local CPU.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
