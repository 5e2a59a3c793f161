"""Multi-host (DCN) smoke: 2 processes x 4 CPU devices, one global collective.

Validates parallel.initialize_distributed end to end: both processes join
the coordination service, see the 8-device global mesh, and a jit with a
replicated out-sharding produces the correct cross-process sum.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; repo = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, repo)
    from rs_face_detection_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=proc_id)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    assert len(jax.devices()) == 8, jax.devices()
    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.ones((8, 16), np.float32) * (proc_id + 1),
        (16, 16),
    )
    total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(x)
    print("SUM", float(jax.device_get(total)), flush=True)
    """
)


def test_two_process_collective(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=220)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
        # 8 rows of 1s + 8 rows of 2s, 16 cols: 128 + 256.
        for out in outs:
            assert "SUM 384.0" in out, out[-2000:]
    finally:
        for p in procs:  # never leave an orphan coordination worker behind
            if p.poll() is None:
                p.kill()
