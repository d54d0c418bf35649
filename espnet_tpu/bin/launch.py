"""Multi-process / cluster launcher.

Behavioral spec: reference `espnet2/bin/launch.py:16` (generate per-node
commands, submit via run.pl/slurm/ssh, collect logs, fail fast) — redesigned
for the JAX multi-controller model: every process runs the SAME training
command; `jax.distributed.initialize` (espnet_tpu/parallel/mesh.py:22)
picks up the coordinator/topology from the environment this launcher sets:

    JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID

Backends:
  local  — fork nproc processes on this host (CPU multi-process testing;
           on real multi-host TPU each host runs one process).
  slurm  — emit (and optionally sbatch) a script whose srun tasks export
           the topology env (reference `launch.py` slurm path).
  ssh    — print/execute one ssh command per host (reference ssh path).

Usage:
  python -m espnet_tpu.bin.launch --nproc 2 -- \
      python -m espnet_tpu.bin.asr_train --data.train_dir ...
"""

from __future__ import annotations

import argparse
import os
import shlex
import socket
import subprocess
import sys
import time
from pathlib import Path


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _topology_env(coord: str, nproc: int, pid: int) -> dict:
    return {
        "JAX_COORDINATOR_ADDRESS": coord,
        "JAX_NUM_PROCESSES": str(nproc),
        "JAX_PROCESS_ID": str(pid),
    }


def run_local(cmd, nproc: int, log_dir: Path, extra_env=None) -> int:
    coord = f"127.0.0.1:{_free_port()}"
    log_dir.mkdir(parents=True, exist_ok=True)
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(_topology_env(coord, nproc, pid))
        env.update(extra_env or {})
        log = open(log_dir / f"proc{pid}.log", "w")
        procs.append((subprocess.Popen(cmd, env=env, stdout=log,
                                       stderr=subprocess.STDOUT), log))
    # Poll ALL children concurrently (~10 Hz): a crashed rank must be
    # detected even while a peer hangs in a distributed barrier — waiting on
    # children sequentially would block forever on the hung one. Reference
    # semantics: `espnet/distributed/pytorch_backend/launch.py:198-231`
    # (1 Hz poll, kill the group on first failure, propagate the rc).
    rc = 0
    live = {i for i in range(nproc)}
    while live:
        for i in sorted(live):
            p, _ = procs[i]
            r = p.poll()
            if r is None:
                continue
            live.discard(i)
            if r and not rc:
                rc = r
                for q, _ in procs:  # fail fast: kill stragglers
                    if q.poll() is None:
                        q.terminate()
        if live:
            time.sleep(0.1)
    for p, log in procs:
        p.wait()
        log.close()
    return rc


def slurm_script(cmd, nproc: int, args) -> str:
    # the per-arg-quoted body is wrapped in `bash -c <script>`; the script
    # itself must be quoted ONCE MORE for the outer shell or any argument
    # containing spaces/quotes produces a broken nested command line.
    body = " ".join(shlex.quote(c) for c in cmd)
    inner = shlex.quote(f"JAX_PROCESS_ID=$SLURM_PROCID exec {body}")
    return f"""#!/usr/bin/env bash
#SBATCH --job-name={args.job_name}
#SBATCH --ntasks={nproc}
#SBATCH --nodes={args.nodes or nproc}
#SBATCH --output={args.log_dir}/slurm-%j.out
# one task per host; task 0's host is the coordinator
COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="$COORD_HOST:{args.port}"
export JAX_NUM_PROCESSES={nproc}
srun --ntasks={nproc} bash -c {inner}
"""


def ssh_commands(cmd, hosts, args):
    coord = f"{hosts[0]}:{args.port}"
    body = " ".join(shlex.quote(c) for c in cmd)
    out = []
    for pid, host in enumerate(hosts):
        env = _topology_env(coord, len(hosts), pid)
        envs = " ".join(f"{k}={v}" for k, v in env.items())
        # quote the assembled remote command as ONE argument to ssh so the
        # remote shell sees the per-arg quoting intact.
        out.append(f"ssh {host} {shlex.quote(envs + ' ' + body)}")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cmd", choices=["local", "slurm", "ssh"],
                   default="local")
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--hosts", default="",
                   help="comma-separated hosts (ssh backend)")
    p.add_argument("--nodes", type=int, default=0, help="slurm nodes")
    p.add_argument("--port", type=int, default=37777)
    p.add_argument("--job_name", default="espnet_tpu")
    p.add_argument("--log_dir", default="launch_logs")
    p.add_argument("--dry_run", action="store_true",
                   help="print scripts/commands without executing")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="-- training command to launch")
    args = p.parse_args(argv)
    cmd = [c for c in args.command if c != "--"]
    if not cmd:
        p.error("no command given (append: -- python -m espnet_tpu.bin....)")

    if args.cmd == "local":
        if args.dry_run:
            print(f"local x{args.nproc}: {' '.join(cmd)}")
            return 0
        return run_local(cmd, args.nproc, Path(args.log_dir))
    if args.cmd == "slurm":
        script = slurm_script(cmd, args.nproc, args)
        if args.dry_run:
            print(script)
            return 0
        Path(args.log_dir).mkdir(parents=True, exist_ok=True)
        path = Path(args.log_dir) / "submit.sh"
        path.write_text(script)
        return subprocess.call(["sbatch", str(path)])
    hosts = [h for h in args.hosts.split(",") if h]
    if not hosts:
        p.error("ssh backend needs --hosts")
    cmds = ssh_commands(cmd, hosts, args)
    if args.dry_run:
        print("\n".join(cmds))
        return 0
    procs = [subprocess.Popen(c, shell=True) for c in cmds]
    return max(pr.wait() for pr in procs)


if __name__ == "__main__":
    sys.exit(main())
