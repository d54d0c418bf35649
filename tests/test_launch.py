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


def test_local_fail_fast_kills_hung_peer(tmp_path):
    """One rank crashes while the other hangs: the launcher must detect the
    crash concurrently (not wait on rank 0 first), kill the straggler, and
    propagate the failing rank's rc (reference
    `espnet/distributed/pytorch_backend/launch.py:198-231`)."""
    import time

    from espnet_tpu.bin.launch import run_local

    worker = tmp_path / "crash_or_hang.py"
    worker.write_text(textwrap.dedent("""
        import os, sys, time
        if os.environ["JAX_PROCESS_ID"] == "1":
            sys.exit(7)      # crashing rank
        time.sleep(600)      # rank 0 hangs in a 'barrier'
    """))
    t0 = time.monotonic()
    rc = run_local([sys.executable, str(worker)], 2, tmp_path / "logs")
    elapsed = time.monotonic() - t0
    assert rc == 7
    assert elapsed < 60, f"fail-fast took {elapsed:.0f}s (sequential wait?)"


def test_quoting_survives_spaces_and_quotes(capsys):
    """slurm/ssh command assembly must survive args with spaces/quotes —
    the inner command is re-quoted once for the outer shell."""
    import shlex

    tricky = ["python", "train.py", "--note", "it's a test", "--x", "a b"]
    rc = launch_main(["--cmd", "ssh", "--hosts", "h1", "--dry_run", "--",
                      *tricky])
    out = capsys.readouterr().out.strip()
    assert rc == 0
    # outer parse: ssh h1 <one remote command string>
    parts = shlex.split(out)
    assert parts[:2] == ["ssh", "h1"]
    assert len(parts) == 3
    # remote shell parse: env assignments + the original argv, intact
    remote = shlex.split(parts[2])
    assert remote[-len(tricky):] == tricky

    rc = launch_main(["--cmd", "slurm", "--nproc", "1", "--dry_run",
                      "--log_dir", "/tmp/x", "--", *tricky])
    out = capsys.readouterr().out
    assert rc == 0
    srun_line = next(ln for ln in out.splitlines() if "srun" in ln)
    parts = shlex.split(srun_line)
    inner = shlex.split(parts[-1])  # the bash -c script
    assert inner[-len(tricky):] == tricky


def test_local_two_process_launch(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "result"
    # the workers are fresh interpreters with worker.py's dir as sys.path[0];
    # make the package under test importable regardless of install state
    repo_root = str(Path(__file__).resolve().parents[1])
    pythonpath = repo_root + (
        ":" + __import__("os").environ["PYTHONPATH"]
        if __import__("os").environ.get("PYTHONPATH") else "")
    env = {"TEST_OUT": str(out), "PYTHONPATH": pythonpath}
    from espnet_tpu.bin.launch import run_local

    rc = run_local([sys.executable, str(worker)], 2,
                   tmp_path / "logs", extra_env=env)
    logs = "\n".join(
        p.read_text() for p in (tmp_path / "logs").glob("*.log"))
    assert rc == 0, logs
    assert (Path(str(out) + ".p0")).exists(), logs
    assert (Path(str(out) + ".p1")).exists(), logs
