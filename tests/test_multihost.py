"""Multi-host scale-out: a REAL 2-process ``jax.distributed`` run on CPU.

Spawns two worker processes (tests/multihost_worker.py), each with 2 virtual
CPU devices, forming one global ('dp': 4) mesh. Together they drive the full
Trainer loop — globally sharded self-play + train batches, host-local replay
partitions, the cross-host generation fence, the host0 threshold broadcast,
and a collective orbax checkpoint — replacing the reference's single-machine
mp.Process topology (training_go.py:276-347, pipeline.py:232-239, 485-497).
"""

import os
import socket
import subprocess
import sys
import tempfile


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_run():
    port = _free_port()
    workdir = tempfile.mkdtemp(prefix="mh_test_")
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK p{pid}" in out

    # Collective checkpoint written once; host0 wrote the training CSV; both
    # hosts harvested games into their own actor CSVs.
    assert os.path.isdir(os.path.join(workdir, "ckpt", "training_steps_4"))
    assert os.path.exists(os.path.join(workdir, "logs0", "training.csv"))
    assert os.path.exists(os.path.join(workdir, "logs0", "actor0.csv"))
    assert os.path.exists(os.path.join(workdir, "logs1", "actor1.csv"))
    with open(os.path.join(workdir, "logs0", "training.csv")) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) >= 3  # header + steps
