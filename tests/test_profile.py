"""Section profiler (train/profile.py): runs on a tiny model and returns a
coherent table (transport-robust op-level attribution, SURVEY §5)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel  # noqa: E402
from espnet_slurp_tpu.ops.frontend import FrontendConfig  # noqa: E402
from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer  # noqa: E402
from espnet_slurp_tpu.train.profile import (format_breakdown,  # noqa: E402
                                            step_breakdown)


def test_step_breakdown_sections():
    cfg = ASRConfig(
        vocab_size=16, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.5,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {"speech": rng.randn(2, 3200).astype(np.float32),
             "speech_lengths": np.full((2,), 3200, np.int32),
             "text": rng.randint(1, 15, (2, 5)).astype(np.int32),
             "text_lengths": np.full((2,), 5, np.int32)}
    params = model.init(jax.random.PRNGKey(0),
                        **{k: np.asarray(v) for k, v in batch.items()}
                        )["params"]
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    sections = step_breakdown(model, params, batch, tx=tx, repeats=1)
    for key in ("frontend(stft+mel)", "encode(frontend+encoder)",
                "ctc_loss", "decoder_forward", "full_forward",
                "forward+backward", "train_step(fwd+bwd+optim)"):
        assert key in sections, key
        assert sections[key]["ms"] > 0
    # cost analysis present on at least the big sections
    assert sections["encode(frontend+encoder)"].get("gflops", 0) > 0
    table = format_breakdown(sections)
    assert "| section |" in table and "train_step" in table
