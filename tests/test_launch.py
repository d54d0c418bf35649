"""Cluster launcher (`espnet_tpu/bin/launch.py`, reference
`espnet2/bin/launch.py:16`): dry-run command generation for slurm/ssh, and
a REAL 2-process local launch on CPU that initializes jax.distributed,
builds a global mesh across processes, and verifies a cross-process
reduction — the multi-host code path the reference exercises with
torch.distributed."""

import subprocess
import sys
import textwrap
from pathlib import Path

from espnet_tpu.bin.launch import main as launch_main


def test_dry_run_slurm(capsys):
    rc = launch_main([
        "--cmd", "slurm", "--nproc", "4", "--nodes", "2", "--dry_run",
        "--log_dir", "/tmp/x", "--", "python", "-m",
        "espnet_tpu.bin.asr_train", "--run.output_dir", "exp",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "#SBATCH --ntasks=4" in out
    assert "JAX_NUM_PROCESSES=4" in out
    assert "JAX_PROCESS_ID=$SLURM_PROCID" in out
    assert "srun" in out


def test_dry_run_ssh(capsys):
    rc = launch_main([
        "--cmd", "ssh", "--hosts", "nodeA,nodeB", "--dry_run",
        "--", "python", "train.py",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 2
    assert "ssh nodeA" in lines[0] and "JAX_PROCESS_ID=0" in lines[0]
    assert "ssh nodeB" in lines[1] and "JAX_PROCESS_ID=1" in lines[1]
    assert "JAX_COORDINATOR_ADDRESS=nodeA:37777" in lines[1]


WORKER = textwrap.dedent("""
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from espnet_tpu.parallel.mesh import init_distributed

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()).reshape(-1)  # 4 global devices
    mesh = Mesh(devs, ("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = np.full((2, 4), float(jax.process_index() + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    with mesh:
        s = float(total(arr))
    # global (4, 4): two rows of 1s from proc0 + two rows of 2s from proc1
    assert abs(s - 24.0) < 1e-6, s
    out = os.environ["TEST_OUT"]
    with open(out + f".p{jax.process_index()}", "w") as f:
        f.write(f"ok {s}")
""")


def test_local_two_process_launch(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "result"
    env = {"TEST_OUT": str(out)}
    from espnet_tpu.bin.launch import run_local

    rc = run_local([sys.executable, str(worker)], 2,
                   tmp_path / "logs", extra_env=env)
    logs = "\n".join(
        p.read_text() for p in (tmp_path / "logs").glob("*.log"))
    assert rc == 0, logs
    assert (Path(str(out) + ".p0")).exists(), logs
    assert (Path(str(out) + ".p1")).exists(), logs
