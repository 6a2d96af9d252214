"""Multi-host scaffolding smoke test: TWO real processes join via
jax.distributed.initialize on the CPU backend (the documented hostless
pattern), build a global mesh spanning both, run one psum over it, and only
process 0 writes the host-side artifact (SURVEY.md §5 distributed-backend
row; VERDICT r2 #9)."""
import json
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import json, os, sys
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from splatloc_tpu.dist import multihost

assert multihost.initialize(), "expected multi-process init"
pid = jax.process_index()
assert jax.process_count() == 2
assert len(jax.devices()) == 2          # one forced CPU device per process

mesh = multihost.global_mesh(data=2)
y = jax.jit(
    jax.shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P()),
    out_shardings=jax.sharding.NamedSharding(mesh, P()),
)(jnp.arange(2, dtype=jnp.float32) + 1.0)

@multihost.primary_only
def write_report(path, value):
    with open(path, "w") as f:
        json.dump({"process": jax.process_index(), "psum": value}, f)

write_report(os.path.join(sys.argv[1], f"report.json"), float(y[0]))
print("child", pid, "ok", flush=True)
"""


def test_two_process_cpu_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # each child must NOT boot the axon TPU plugin (this environment's
    # sitecustomize hangs every `import jax` when the TPU tunnel is down)
    # and must see exactly ONE local CPU device
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["SPLATLOC_COORDINATOR"] = f"localhost:{port}"
    env["SPLATLOC_NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        e = dict(env, SPLATLOC_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(tmp_path)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process smoke timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    report = json.load(open(tmp_path / "report.json"))
    assert report["process"] == 0        # primary-only write
    assert report["psum"] == 3.0         # 1 + 2 across the two processes
