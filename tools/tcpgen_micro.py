"""CPU micro-validation of the TCPGen training recipe.

Trains a micro conformer+TCPGen on a small hard corpus (rare words appear
1-3 times each) with the per-batch biasing augmenter (slu/kb.py
TCPGenBatchAugmenter: 20-word lists, DBdrop 0.3, pointer ramp), then
decodes the test set with and without decode-time biasing and reports:

  * pointer reachability: fraction of teacher-forced steps where the true
    next token is a child of the walk's current node (upper bound on what
    the pointer can contribute);
  * p_gen trajectory over epochs (the failure mode being fixed: the gate
    collapsing to 0 because the pointer never had positive signal);
  * WER / rare-word WER for beam decode with and without biasing_words.

Usage: JAX_PLATFORMS=cpu python tools/tcpgen_micro.py [--n_train 400]
"""
import argparse
import json
import logging
import shutil
import sys
import time
from pathlib import Path

import numpy as np

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("espnet_slurp_tpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--max_epoch", type=int, default=14)
    p.add_argument("--out", default="/tmp/tcpgen_micro")
    p.add_argument("--fresh", action="store_true")
    args = p.parse_args()

    from espnet_slurp_tpu.data.tokenizer import (TokenIDConverter,
                                                 build_tokenizer)
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.specaug import SpecAugConfig
    from espnet_slurp_tpu.recipe.ablation_run import make_hard_corpus
    from espnet_slurp_tpu.slu.kb import (TCPGenBatchAugmenter,
                                         boundary_token_ids)
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig, Speech2Text)
    from espnet_slurp_tpu.train.optim import OptimConfig
    from espnet_slurp_tpu.utils.metrics import (error_rate,
                                                rare_word_error_rate)
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text

    out = Path(args.out)
    if args.fresh and out.exists():
        shutil.rmtree(out)
    t0 = time.time()
    train_dir, dev_dir, test_dir, rare = make_hard_corpus(
        out / "corpus", n_train=args.n_train, n_dev=40, n_test=80,
        vocab_size=150, n_rare=50, seed=11)
    log.info("corpus ready (%.0fs)", time.time() - t0)

    import dataclasses as _dc
    base_exp = out / "exp_base"
    model_kw = dict(
        d_model=64, n_head=2, d_ff=256, num_encoder_blocks=2,
        num_decoder_blocks=1, decoder_d_ff=256, kernel_size=7,
        dropout_rate=0.1, ctc_weight=0.3, use_mvn="utterance",
        specaug=SpecAugConfig(freq_mask_width_range=(0, 6),
                              time_mask_width_range=(0, 15)))
    base_cfg = ASRTaskConfig(
        exp_dir=str(base_exp),
        model=ASRConfig(**model_kw),
        optim=OptimConfig(lr=2e-3, scheduler="warmuplr", warmup_steps=300),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="bpe", bpe_vocab_size=150,
                        bpe_marker="suffix",
                        batch_type="numel", batch_bins=600_000,
                        speech_bucket_multiple=8192, text_bucket_multiple=8,
                        batch_size_multiple=8),
        max_epoch=args.max_epoch, keep_nbest=4, nbest_average=2,
        log_interval=20)
    log.info("=== base training ===")
    ASRTask.train(base_cfg)

    # --- TCPGen fine-tune: warm-start from the base average, pointer ON
    # from epoch 1 (the base stage played the reference's PtrSche role) ---
    exp = out / "exp_tcpgen"
    exp.mkdir(parents=True, exist_ok=True)
    shutil.copy(base_exp / "tokens.txt", exp / "tokens.txt")
    cfg = _dc.replace(
        base_cfg, exp_dir=str(exp),
        model=ASRConfig(use_tcpgen=True, tcpgen_ptr_loss_weight=1.0,
                        tcpgen_gate_loss_weight=0.2, **model_kw),
        data=_dc.replace(base_cfg.data, bpemodel=str(base_exp / "bpe.json")),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        init_params_from=str(base_exp / "valid.loss.ave_2best"),
        max_epoch=8, keep_nbest=3, nbest_average=2)

    tokenizer, converter, _ = ASRTask.prepare_vocab(cfg)
    # f30-analogue biasing vocabulary: every word with train frequency <=
    # threshold (fork: data/KB/rarewords_f30.txt). The ultra-rare eval set
    # is a subset; the broader tail gives the gate enough positive signal
    # to learn WHEN to point.
    from collections import Counter
    wc = Counter(w for t in read_2column_text(
        Path(train_dir) / "text").values() for w in t.split())
    bias_vocab = sorted(w for w, c in wc.items() if c <= 30)
    bias_vocab = sorted(set(bias_vocab) | set(rare))
    log.info("biasing vocabulary: %d words (rare eval set: %d)",
             len(bias_vocab), len(rare))
    pieces = [converter.tokens2ids(tokenizer.text2tokens(w))
              for w in bias_vocab]
    bset, prefix = boundary_token_ids(converter.token_list)
    aug = TCPGenBatchAugmenter(pieces, bset, cfg.model.sos_id,
                               cfg.model.eos_id, prefix_boundary=prefix,
                               kb_len=30, db_drop=0.3, sched_epochs=3,
                               seed=7)

    # --- pointer reachability probe (pre-training, pure data question) ---
    from espnet_slurp_tpu.slu.kb import build_trie, walk_trie
    text = read_2column_text(Path(train_dir) / "text")
    ids = [np.asarray(converter.tokens2ids(tokenizer.text2tokens(t)))
           for t in list(text.values())[:200]]
    full_trie = build_trie(pieces)
    reach = tot = rare_reach = rare_tot = 0
    for y in ids:
        ys_in = np.concatenate([[cfg.model.sos_id], y])[None, :]
        node, mask = walk_trie(full_trie, ys_in, bset, cfg.model.eos_id,
                               prefix_boundary=prefix)
        for j in range(len(y)):  # target at step j is y[j]
            n = node[0, j]
            kids = full_trie.children_tok[n, :full_trie.n_children[n]]
            hit = int(y[j]) in kids.tolist()
            live = mask[0, j] == 0
            tot += 1
            reach += int(live and hit)
            # rare-word step: target token starts/continues a rare word —
            # approximate by hit-ness itself for the report
            if hit:
                rare_tot += 1
                rare_reach += int(live)
    log.info("pointer reachability: %.1f%% of steps in-trie-reachable "
             "(%d/%d); of in-trie steps, %.1f%% have a live pointer",
             100 * reach / tot, reach, tot,
             100 * rare_reach / max(rare_tot, 1))

    class Task(ASRTask):
        @classmethod
        def build_iter_factory(cls, cfg_, dataset, shuffle=True, rank=0,
                               world=1, batch_divisor=0):
            base = ASRTask.build_iter_factory(
                cfg_, dataset, shuffle=shuffle, rank=rank, world=world,
                batch_divisor=batch_divisor)
            return aug.wrap(base)

    log.info("=== training ===")
    Task.train(cfg)
    hist = json.load(open(exp / "reporter.json"))["history"]
    pg = [(e["epoch"], round(e["train"].get("p_gen", -1), 4),
           round(e["valid"].get("p_gen", -1), 4)) for e in hist]
    log.info("p_gen by epoch (train, valid): %s", pg)

    # --- decode ---
    refs = read_2column_text(Path(test_dir) / "text")
    wavs = read_2column_text(Path(test_dir) / "wav.scp")
    loaded = sorted(((u, load_wav(pth)[0]) for u, pth in wavs.items()),
                    key=lambda x: len(x[1]))

    def run(tag, **kw):
        s2t = Speech2Text(str(exp), beam_size=10, ctc_weight=0.3,
                          max_len=24, **kw)
        hyps = {}
        for i in range(0, len(loaded), 16):
            chunk = loaded[i:i + 16]
            for (u, _), txt in zip(chunk,
                                   s2t.decode_batch([x for _, x in chunk])):
                hyps[u] = txt
        wer, _ = error_rate(refs, hyps, "word")
        rare_wer, common_wer, _, _ = rare_word_error_rate(refs, hyps, rare)
        log.info("%s: WER %.2f%% rare %.2f%% common %.2f%%",
                 tag, wer * 100, rare_wer * 100, common_wer * 100)
        return dict(wer=wer, rare_wer=rare_wer, common_wer=common_wer)

    r_base = None
    try:
        s2t = Speech2Text(str(base_exp), beam_size=10, ctc_weight=0.3,
                          max_len=24)
        hyps = {}
        for i in range(0, len(loaded), 16):
            chunk = loaded[i:i + 16]
            for (u, _), txt in zip(chunk,
                                   s2t.decode_batch([x for _, x in chunk])):
                hyps[u] = txt
        wer, _ = error_rate(refs, hyps, "word")
        rare_wer, common_wer, _, _ = rare_word_error_rate(refs, hyps, rare)
        log.info("base: WER %.2f%% rare %.2f%%", wer * 100, rare_wer * 100)
        r_base = dict(wer=wer, rare_wer=rare_wer, common_wer=common_wer)
    except Exception as e:  # noqa: BLE001
        log.warning("base decode failed: %s", e)
    r_nobias = run("nobias")
    r_bias = run("bias", biasing_words=bias_vocab)
    print(json.dumps({"base": r_base, "nobias": r_nobias, "bias": r_bias,
                      "p_gen_final": pg[-1]}))


if __name__ == "__main__":
    main()
