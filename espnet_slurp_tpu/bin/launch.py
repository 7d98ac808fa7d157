"""Multi-process / multi-host launcher.

Parity target: reference espnet2/bin/launch.py:1-384 (ssh / run.pl / slurm
process spawner around torch.distributed rendezvous). The TPU-native
redesign launches one worker per host/process with a jax.distributed
coordinator rendezvous instead of NCCL env:// — workers call
``init_distributed()`` (parallel/mesh.py), which picks the coordinates up
from the environment variables this launcher sets:

  ESPNET_COORDINATOR  host:port of process 0
  ESPNET_NUM_PROCESSES  world size
  ESPNET_PROCESS_ID     this worker's rank

Modes:
- local (default): spawn all workers on this machine (pod simulation /
  single-host multi-process). Worker stdout/err tee to per-rank logs;
  the first failure kills the rest and propagates the exit code
  (reference worker-error semantics, test_distributed_launch.py).
- --host h1,h2,...: emit (or run with --run_ssh) one ssh command per host,
  each with the rendezvous env prepended — cluster glue without assuming a
  scheduler. Slurm/Kubernetes users should instead export the variables in
  their job script; jax.distributed also auto-discovers real TPU pods.

Example:
  python -m espnet_slurp_tpu.bin.launch --num_processes 2 -- \
      python -m espnet_slurp_tpu.bin.asr_train --config conf/train.yaml
"""
from __future__ import annotations

import argparse
import logging
import os
import shlex
import socket
import subprocess
import sys
from pathlib import Path

log = logging.getLogger("espnet_slurp_tpu")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def worker_env(coordinator: str, world: int, rank: int) -> dict:
    env = dict(os.environ)
    env["ESPNET_COORDINATOR"] = coordinator
    env["ESPNET_NUM_PROCESSES"] = str(world)
    env["ESPNET_PROCESS_ID"] = str(rank)
    return env


def launch_local(cmd, world: int, coordinator: str, log_dir: Path) -> int:
    """Spawn ``world`` copies of cmd locally; kill-all on first failure."""
    log_dir.mkdir(parents=True, exist_ok=True)
    procs = []
    logs = []
    for rank in range(world):
        lf = open(log_dir / f"worker.{rank}.log", "w")
        logs.append(lf)
        procs.append(subprocess.Popen(
            cmd, env=worker_env(coordinator, world, rank),
            stdout=lf, stderr=subprocess.STDOUT))
    rc = 0
    try:
        remaining = set(range(world))
        while remaining:
            for rank in sorted(remaining):
                p = procs[rank]
                r = p.poll()
                if r is None:
                    continue
                remaining.discard(rank)
                if r != 0:
                    log.error("worker %d failed (rc=%d); killing the rest "
                              "(see %s)", rank, r,
                              log_dir / f"worker.{rank}.log")
                    rc = r
                    for q in procs:
                        if q.poll() is None:
                            q.kill()
                    remaining.clear()
                    break
            else:
                if remaining:
                    try:
                        procs[min(remaining)].wait(timeout=0.2)
                    except subprocess.TimeoutExpired:
                        pass
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for lf in logs:
            lf.close()
    return rc


def ssh_commands(cmd, hosts, coordinator: str):
    """One ssh invocation per host, rank = host index."""
    world = len(hosts)
    out = []
    for rank, host in enumerate(hosts):
        envs = (f"ESPNET_COORDINATOR={shlex.quote(coordinator)} "
                f"ESPNET_NUM_PROCESSES={world} ESPNET_PROCESS_ID={rank}")
        inner = " ".join(shlex.quote(c) for c in cmd)
        out.append(["ssh", host, f"{envs} {inner}"])
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(
        description="Launch distributed workers (TPU-native launch.py)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="local worker count (default: number of hosts, "
                        "or 1)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (default: this host, "
                        "a free port)")
    p.add_argument("--host", default=None,
                   help="comma-separated remote hosts (ssh mode)")
    p.add_argument("--run_ssh", action="store_true",
                   help="actually run the ssh commands instead of printing")
    p.add_argument("--log_dir", default="exp/launch")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="worker command (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no worker command given")

    if args.host:
        hosts = [h for h in args.host.split(",") if h]
        coordinator = args.coordinator or f"{hosts[0]}:{free_port()}"
        cmds = ssh_commands(cmd, hosts, coordinator)
        if not args.run_ssh:
            for c in cmds:
                print(" ".join(shlex.quote(x) for x in c))
            return 0
        procs = [subprocess.Popen(c) for c in cmds]
        rc = 0
        for q in procs:
            rc = rc or q.wait()
        return rc

    world = args.num_processes or 1
    coordinator = args.coordinator or f"127.0.0.1:{free_port()}"
    return launch_local(cmd, world, coordinator, Path(args.log_dir))


if __name__ == "__main__":
    raise SystemExit(main())
