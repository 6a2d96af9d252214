"""Test harness: run everything on a virtual 8-device CPU mesh so the suite
is hostless and the multi-chip sharding paths are exercised without a pod
(standard JAX pattern, SURVEY.md §4).

Exception: SPLATLOC_QUALITY_GATE=1 keeps the real accelerator — the opt-in
full-scale gate (tests/test_quality_gate.py) is TPU-scale by design."""
import os

_KEEP_DEVICE = bool(os.environ.get("SPLATLOC_QUALITY_GATE"))

if not _KEEP_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so the env var alone is not enough — switch the
# already-imported config to CPU explicitly.
if not _KEEP_DEVICE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: no persistent compilation cache here — the axon environment routes
# XLA compiles through a remote-compile service whose AOT results are built
# for a different host CPU (cpu_aot_loader machine-feature mismatch), so
# cached executables are not trustworthy across runs.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
