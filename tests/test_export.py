"""Serving export: jax.export StableHLO artifact round trip (bin/export_model)."""
import numpy as np
import jax.numpy as jnp


def test_export_and_reload_decodes(tmp_path):
    from espnet_slurp_tpu.bin.export_model import (export_speech2text,
                                                   load_exported)
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import ASRTask, ASRTaskConfig, DataConfig
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(d_model=32, n_head=2, d_ff=64,
                        num_encoder_blocks=1, num_decoder_blocks=1,
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16),
                        specaug=None, use_mvn="none"),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=4,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTask.train(cfg)

    out = export_speech2text(cfg.exp_dir, str(tmp_path / "served"),
                             batch=2, num_samples=4096, beam_size=1,
                             max_len=8)
    assert (out / "model.stablehlo").exists()
    call, tokens, meta = load_exported(str(out))
    rng = np.random.RandomState(0)
    speech = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.1)
    lens = jnp.asarray([4096, 3000], jnp.int32)
    toks, tlens = call(speech, lens)
    assert toks.shape == (2, 8)
    assert (np.asarray(tlens) <= 8).all()
    assert len(tokens) > 4  # token list shipped with the artifact


def test_serve_endpoint(tmp_path):
    """Threaded HTTP server over the artifact: /healthz + /recognize."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import numpy as np

    from espnet_slurp_tpu.bin.export_model import load_exported
    from espnet_slurp_tpu.bin.serve import build_handler

    # reuse an artifact by exporting the micro model fresh (cheap, CPU)
    from espnet_slurp_tpu.bin.export_model import export_speech2text
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import ASRTask, ASRTaskConfig, DataConfig
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(d_model=32, n_head=2, d_ff=64,
                        num_encoder_blocks=1, num_decoder_blocks=1,
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16),
                        specaug=None, use_mvn="none"),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=4,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTask.train(cfg)
    out = export_speech2text(cfg.exp_dir, str(tmp_path / "served"),
                             batch=1, num_samples=4096, beam_size=1,
                             max_len=6)
    call, tokens, meta = load_exported(str(out))
    handler, _ = build_handler(call, tokens, meta, "pcm16")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        wav = (np.random.RandomState(0).randn(3200) * 3000).astype(np.int16)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize", data=wav.tobytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        assert "text" in payload and payload["n_samples"] == 3200
        # over-bucket audio -> 413
        big = np.zeros(9000, np.int16)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize", data=big.tobytes(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        srv.shutdown()
