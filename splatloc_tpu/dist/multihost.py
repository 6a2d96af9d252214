"""Multi-host (multi-process) execution scaffolding.

The reference is strictly single-process (SURVEY.md §2.3); scaling past one
host is new architecture: ``jax.distributed.initialize`` joins the
processes of a pod slice (or a multi-process CPU test rig) into one global
device set, meshes span all processes, and XLA routes collectives over
ICI/DCN. Host-side artifacts (checkpoints, eval reports, metrics streams)
are written by process 0 only.

Environment contract (mirrors the standard JAX launcher variables):
  SPLATLOC_COORDINATOR   host:port of process 0 (absent => single-process)
  SPLATLOC_NUM_PROCESSES total process count
  SPLATLOC_PROCESS_ID    this process's id in [0, NUM_PROCESSES)

Smoke-tested without hardware via the documented multi-process CPU pattern
(two local processes, one forced CPU device each) in
tests/test_multihost.py.
"""
from __future__ import annotations

import os

import jax


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids: list[int] | None = None) -> bool:
    """Join the job's processes via jax.distributed. Args default to the
    SPLATLOC_* env contract; returns True if multi-process mode was
    initialized, False for the (default) single-process path."""
    coordinator = coordinator or os.environ.get("SPLATLOC_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None:
        num_processes = int(os.environ["SPLATLOC_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["SPLATLOC_PROCESS_ID"])
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def is_primary() -> bool:
    """True on the process that owns host-side artifact writes
    (checkpoints, eval_*.txt reports, metrics.jsonl)."""
    return jax.process_index() == 0


def primary_only(fn):
    """Decorator: run fn on process 0 only; other processes return None.
    For checkpoint/report writers — device-side collectives must NOT be
    guarded with this (every process participates in those)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        if is_primary():
            return fn(*a, **kw)
        return None
    return wrapped


def global_mesh(**axis_sizes) -> "jax.sharding.Mesh":
    """Mesh over ALL processes' devices, e.g. global_mesh(data=2, gauss=4).
    Device order follows jax.devices() (process-major), so a leading 'data'
    axis maps frames to processes and keeps its collectives on DCN while
    inner axes ride ICI."""
    import numpy as np
    from jax.sharding import Mesh
    devices = jax.devices()
    n = 1
    for s in axis_sizes.values():
        n *= s
    assert len(devices) >= n, (len(devices), axis_sizes)
    dev = np.asarray(devices[:n]).reshape(tuple(axis_sizes.values()))
    return Mesh(dev, axis_names=tuple(axis_sizes))
