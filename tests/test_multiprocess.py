"""Multi-process data-parallel training test (2 processes x 4 CPU devices).

The fake-backend analogue of a 2-host pod (SURVEY.md §4 distributed-test
strategy; reference test/test_distributed_launch.py spawns plain-function
workers): each process runs jax.distributed.initialize against a localhost
coordinator, builds the global 8-device mesh, and runs the FULL
ASRTask.train loop — per-process batch slices assembled with
make_array_from_process_local_data, primary-only orbax checkpointing with
cross-process barriers.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
port, pid, corpus, exp = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()

from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.parallel.mesh import make_mesh
from espnet_slurp_tpu.tasks.asr import ASRTask, ASRTaskConfig, DataConfig
from espnet_slurp_tpu.train.optim import OptimConfig

cfg = ASRTaskConfig(
    exp_dir=exp,
    model=ASRConfig(d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
                    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
                    dropout_rate=0.0, ctc_weight=0.3, use_mvn="none",
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16),
                    specaug=None),
    optim=OptimConfig(lr=1e-3, scheduler="constant"),
    data=DataConfig(train_dir=f"{corpus}/train", valid_dir=f"{corpus}/dev",
                    token_type="word", batch_type="sorted", batch_size=8,
                    speech_bucket_multiple=2048, text_bucket_multiple=4),
    max_epoch=1, keep_nbest=1, nbest_average=1, resume=False)
mesh = make_mesh()   # (8, 1): data parallel over both processes
state = ASRTask.train(cfg, mesh=mesh)
print(f"WORKER_OK pid={pid} step={int(state.step)}", flush=True)
"""


def test_two_process_training(tmp_path):
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    corpus = tmp_path / "corpus"
    make_mini_corpus(corpus, n_train=16, n_dev=4)
    exp = tmp_path / "exp"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": str(Path(__file__).resolve().parents[1]) + os.pathsep
        + env.get("PYTHONPATH", ""),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(port), str(i), str(corpus),
             str(exp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "WORKER_OK" in out, out[-2000:]

    # one (primary-only) checkpoint + sane reporter
    assert (exp / "1epoch").exists()
    hist = json.loads((exp / "reporter.json").read_text())["history"]
    assert hist and "loss" in hist[0]["train"]
    import math
    assert math.isfinite(hist[0]["train"]["loss"])
