"""Test configuration.

Mirrors the reference's testing strategy (SURVEY §4): correctness runs
serially in float64 on the CPU backend; multi-device tests use a virtual
8-device CPU mesh (the analogue of the reference's `mpiexec -np N` on one
host).  XLA_FLAGS must be set before jax initializes.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
# NB: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# entries written under one set of target machine features (e.g. when the
# TPU plugin is the default backend) mis-execute when loaded in another
# context (observed as silently wrong kernel outputs).

import pytest  # noqa: E402


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
