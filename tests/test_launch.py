"""Launcher tests (reference test/test_distributed_launch.py analogue):
rendezvous env correctness, real 2-process jax.distributed bring-up
through the launcher, worker-error propagation, ssh command emission."""
import subprocess
import sys
from pathlib import Path

import pytest

from espnet_slurp_tpu.bin.launch import (free_port, launch_local, main,
                                         ssh_commands, worker_env)


def test_worker_env_and_ssh_commands():
    env = worker_env("10.0.0.1:1234", 4, 2)
    assert env["ESPNET_COORDINATOR"] == "10.0.0.1:1234"
    assert env["ESPNET_NUM_PROCESSES"] == "4"
    assert env["ESPNET_PROCESS_ID"] == "2"
    cmds = ssh_commands(["python", "-m", "x"], ["h1", "h2"], "h1:99")
    assert cmds[0][0] == "ssh" and cmds[0][1] == "h1"
    assert "ESPNET_PROCESS_ID=1" in cmds[1][2]
    assert "ESPNET_NUM_PROCESSES=2" in cmds[1][2]


WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from espnet_slurp_tpu.parallel.mesh import init_distributed
init_distributed()  # picks up ESPNET_* from the launcher
assert jax.process_count() == 2, jax.process_count()
rank = int(os.environ["ESPNET_PROCESS_ID"])
print(f"WORKER_OK rank={rank} world={jax.process_count()}", flush=True)
"""


def test_launch_local_two_process_rendezvous(tmp_path):
    rc = launch_local([sys.executable, "-c", WORKER], 2,
                      f"127.0.0.1:{free_port()}", tmp_path / "logs")
    assert rc == 0
    for rank in range(2):
        text = (tmp_path / "logs" / f"worker.{rank}.log").read_text()
        assert f"WORKER_OK rank={rank} world=2" in text


def test_launch_propagates_worker_failure(tmp_path):
    bad = "import sys, os\nsys.exit(3 if os.environ['ESPNET_PROCESS_ID']" \
          " == '1' else 0)"
    rc = launch_local([sys.executable, "-c", bad], 2,
                      f"127.0.0.1:{free_port()}", tmp_path / "logs")
    assert rc == 3


def test_launch_cli_prints_ssh(capsys):
    rc = main(["--host", "a,b", "--coordinator", "a:7777", "--",
               "python", "-m", "espnet_slurp_tpu.bin.asr_train"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 and out[0].startswith("ssh a")


def test_sbatch_emitter(tmp_path, capsys):
    """--backend slurm emits a slurm.pl-analogue sbatch script
    (reference egs2/TEMPLATE/asr1/cmd.sh, utils/parallel/slurm.pl)."""
    from espnet_slurp_tpu.bin.launch import main, sbatch_script
    rc = main(["--backend", "slurm", "--num_processes", "4",
               "--tasks_per_node", "2", "--partition", "tpu",
               "--time_limit", "2:00:00",
               "--log_dir", str(tmp_path), "--",
               "python", "-m", "espnet_slurp_tpu.bin.asr_train",
               "--config", "conf/train.yaml"])
    assert rc == 0
    out = capsys.readouterr().out
    script = (tmp_path / "submit.sbatch").read_text()
    assert out == script
    assert "#SBATCH --ntasks=4" in script
    assert "#SBATCH --nodes=2" in script
    assert "#SBATCH --ntasks-per-node=2" in script
    assert "#SBATCH --partition=tpu" in script
    assert "#SBATCH --time=2:00:00" in script
    assert "srun --ntasks=4 python -m espnet_slurp_tpu.bin.asr_train" \
        in script
    assert "ESPNET_COORDINATOR_PORT" in script
    # quoting survives round trips
    s2 = sbatch_script(["echo", "a b"], 1)
    assert "'a b'" in s2


def test_queue_emitter(tmp_path, capsys):
    """--backend queue emits one qsub per rank with explicit rendezvous
    env (queue.pl analogue)."""
    from espnet_slurp_tpu.bin.launch import main
    rc = main(["--backend", "queue", "--num_processes", "2",
               "--queue", "all.q", "--coordinator", "h0:29500",
               "--log_dir", str(tmp_path), "--", "python", "train.py"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("qsub -cwd")
    assert "ESPNET_PROCESS_ID=0" in lines[0]
    assert "ESPNET_PROCESS_ID=1" in lines[1]
    assert "ESPNET_NUM_PROCESSES=2" in lines[0]
    assert "-q all.q" in lines[0]


def test_slurm_env_rank_resolution(monkeypatch):
    """init_distributed resolves rank/world/coordinator from SLURM env
    (reference distributed_utils.py:200-305)."""
    from espnet_slurp_tpu.parallel.mesh import slurm_first_node
    assert slurm_first_node("a01,a02") == "a01"
    assert slurm_first_node("node[001-003,007]") == "node001"
    assert slurm_first_node("node[5],other[1-2]") == "node5"
    assert slurm_first_node("") == ""
