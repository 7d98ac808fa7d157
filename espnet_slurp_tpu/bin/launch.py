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


def sbatch_script(cmd, world: int, *, job_name: str = "espnet_slurp_tpu",
                  partition: str | None = None, time_limit: str | None = None,
                  tasks_per_node: int = 1, log_dir: str = "exp/launch",
                  coordinator_port: int = 29500,
                  extra_sbatch: tuple = ()) -> str:
    """Render an sbatch submission script (slurm.pl / cmd.sh analogue,
    reference egs2/TEMPLATE/asr1/cmd.sh + utils/parallel/slurm.pl).

    srun starts ``world`` tasks; each worker resolves its rank from
    SLURM_PROCID and the coordinator from the first node of
    SLURM_JOB_NODELIST + ESPNET_COORDINATOR_PORT (parallel/mesh.py
    init_distributed).
    """
    nodes = (world + tasks_per_node - 1) // tasks_per_node
    lines = ["#!/usr/bin/env bash",
             f"#SBATCH --job-name={job_name}",
             f"#SBATCH --ntasks={world}",
             f"#SBATCH --nodes={nodes}",
             f"#SBATCH --ntasks-per-node={tasks_per_node}",
             f"#SBATCH --output={log_dir}/slurm.%j.%t.log"]
    if partition:
        lines.append(f"#SBATCH --partition={partition}")
    if time_limit:
        lines.append(f"#SBATCH --time={time_limit}")
    lines.extend(f"#SBATCH {x}" for x in extra_sbatch)
    inner = " ".join(shlex.quote(c) for c in cmd)
    lines += ["",
              f"export ESPNET_COORDINATOR_PORT={coordinator_port}",
              f"srun --ntasks={world} {inner}",
              ""]
    return "\n".join(lines)


def queue_commands(cmd, world: int, *, job_name: str = "espnet_slurp_tpu",
                   queue: str | None = None, log_dir: str = "exp/launch",
                   coordinator: str = "127.0.0.1:29500"):
    """One qsub invocation per rank (queue.pl / GridEngine analogue).

    Each job carries the explicit ESPNET_* rendezvous env (GridEngine has
    no SLURM_PROCID equivalent across array jobs with different commands).
    """
    inner = " ".join(shlex.quote(c) for c in cmd)
    out = []
    for rank in range(world):
        envs = (f"ESPNET_COORDINATOR={coordinator},"
                f"ESPNET_NUM_PROCESSES={world},ESPNET_PROCESS_ID={rank}")
        job = ["qsub", "-cwd", "-N", f"{job_name}.{rank}",
               "-o", f"{log_dir}/queue.{rank}.log", "-j", "y",
               "-v", envs]
        if queue:
            job += ["-q", queue]
        job += ["-b", "y", inner]
        out.append(job)
    return out


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
    p.add_argument("--backend", default=None,
                   choices=("local", "ssh", "slurm", "queue"),
                   help="scheduler glue (cmd.sh run.pl/queue.pl/slurm.pl "
                        "analogue); default local, or ssh when --host set")
    p.add_argument("--partition", default=None,
                   help="slurm partition (#SBATCH --partition)")
    p.add_argument("--time_limit", default=None,
                   help="slurm time limit (#SBATCH --time)")
    p.add_argument("--tasks_per_node", type=int, default=1)
    p.add_argument("--queue", default=None, help="GridEngine queue (-q)")
    p.add_argument("--submit", action="store_true",
                   help="actually sbatch/qsub instead of printing")
    p.add_argument("--log_dir", default="exp/launch")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="worker command (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no worker command given")

    backend = args.backend or ("ssh" if args.host else "local")
    if backend == "slurm":
        world = args.num_processes or 1
        script = sbatch_script(
            cmd, world, partition=args.partition,
            time_limit=args.time_limit,
            tasks_per_node=args.tasks_per_node, log_dir=args.log_dir)
        Path(args.log_dir).mkdir(parents=True, exist_ok=True)
        path = Path(args.log_dir) / "submit.sbatch"
        path.write_text(script)
        if not args.submit:
            print(script, end="")
            log.info("wrote %s (pass --submit to sbatch it)", path)
            return 0
        return subprocess.call(["sbatch", str(path)])
    if backend == "queue":
        world = args.num_processes or 1
        coordinator = args.coordinator or f"{socket.gethostname()}:29500"
        cmds = queue_commands(cmd, world, queue=args.queue,
                              log_dir=args.log_dir, coordinator=coordinator)
        if not args.submit:
            for c in cmds:
                print(" ".join(shlex.quote(x) for x in c))
            return 0
        rc = 0
        for c in cmds:
            rc = rc or subprocess.call(c)
        return rc
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
