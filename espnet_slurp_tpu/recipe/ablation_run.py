"""Ablation-grade quality runs on a hard synthetic corpus.

VERDICT r2 weak #1 / next-step #5: the earlier quality runs saturate
(WER < 5% on a 100-word corpus), so they prove plumbing, not that each
feature moves its metric. This harness scales the corpus until it stops
saturating (10k utts, 1000-word Zipf vocabulary, bigram grammar, heavier
noise + random channel tilt, BPE tokens) and publishes DELTAS:

  - beam search > greedy             (decode/beam.py vs greedy)
  - + LM shallow fusion helps        (the bigram grammar is learnable by
                                      the transformer LM but only weakly
                                      by the AM under noise)
  - + TCPGen cuts rare-word WER      (Zipf tail words appear 1-3 times in
                                      training; every test utterance holds
                                      >= 1; biasing list = the rare set;
                                      metric = rare_word_error_rate, the
                                      KB_utils/wer.py analogue)
  - + MBR fine-tune cuts WER         (train/mbr.py expected-risk)

Training setup mirrors the fork's biasing recipe
(egs/slurp/asr1/conf/train_mbr_KB.yaml: BPE, per-batch biasing tries with
distractors + DBdrop, MBR fine-tune from a CE-trained model).

Usage: python -m espnet_slurp_tpu.recipe.ablation_run \
           [--out exp/ablations] [--n_train 10000] [--max_epoch 25]
Writes {out}/RESULTS_ABLATIONS.md.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import shutil
import time
from pathlib import Path

import numpy as np

from ..data.fileio import DatadirWriter, load_wav, read_2column_text, write_wav
from .results_run import N_UNITS, _unit_wave

log = logging.getLogger("espnet_slurp_tpu")


def make_hard_corpus(root, n_train=10000, n_dev=200, n_test=400,
                     vocab_size=1000, n_rare=300, fs=16000, seed=23,
                     compositional=False):
    """Zipf vocabulary + sparse bigram grammar + rare-word tail.

    Common words (vocab_size - n_rare) follow a Zipf draw through a sparse
    bigram graph (20 successors per word) so a text LM has real signal.
    Rare words appear 1-3 times in training and >= 1 per test utterance
    (the biasing split). Writes {root}/{train,dev,test} + rare_words.txt.
    Returns (train, dev, test, rare_words).

    compositional=True maps each CHARACTER to a fixed acoustic unit
    (grapheme acoustics, like real speech) instead of giving every word a
    random unit sequence. With random lexicons a rare word's sound->text
    mapping is word-specific and 1-3 training examples can never teach
    it — rare WER pins near 100% no matter how the decoder is biased
    (observed: forced-p_gen decode recovers nothing). Compositional
    acoustics make rare words acoustically decodable; what suppresses
    them is the decoder/beam prior over unseen piece sequences — exactly
    the failure mode TCPGen contextual biasing exists to fix
    (reference: KB_utils/KB.py biasing lists target proper nouns, which
    are rare in text but phonetically regular).
    """
    root = Path(root)
    words = [f"w{i:04d}" for i in range(vocab_size)]
    rare = words[vocab_size - n_rare:]
    if (root / "test" / "wav.scp").exists():
        _ensure_lm_text(root, words, vocab_size - n_rare, seed)
        return (root / "train", root / "dev", root / "test", rare)
    rng = np.random.RandomState(seed)
    if compositional:
        alphabet = sorted({c for w in words for c in w})
        char_unit = {c: int(round(i * (N_UNITS - 1)
                                  / max(len(alphabet) - 1, 1)))
                     for i, c in enumerate(alphabet)}
        lexicon = {w: [char_unit[c] for c in w] for w in words}
        # keep the rng call sequence aligned with the random-lexicon
        # branch so downstream draws (succ/rare budgets) match _ensure_lm_text
        for w in words:
            rng.randint(0, N_UNITS, size=rng.randint(2, 6))
    else:
        lexicon = {w: rng.randint(0, N_UNITS,
                                  size=rng.randint(2, 6)).tolist()
                   for w in words}
    n_common = vocab_size - n_rare
    # Zipf over common words; sparse bigram successors (grammar).
    zipf = 1.0 / np.arange(1, n_common + 1)
    zipf /= zipf.sum()
    succ = {i: rng.choice(n_common, size=20, replace=False, p=None)
            for i in range(n_common)}
    # Rare-word training budget: each rare word 1-3 occurrences total.
    rare_budget = {w: int(rng.randint(1, 4)) for w in rare}
    rare_pool = [w for w, k in rare_budget.items() for _ in range(k)]
    rng.shuffle(rare_pool)
    # tiny smoke corpora: can't give every rare word a slot
    rare_pool = rare_pool[: max(n_train // 2, 1)]
    rare_slots = sorted(rng.choice(n_train, size=len(rare_pool),
                                   replace=False))
    slot_of = {s: rare_pool[i] for i, s in enumerate(rare_slots)}

    def sentence(n_words, force_rare=None):
        w = int(rng.choice(n_common, p=zipf))
        out = [words[w]]
        for _ in range(n_words - 1):
            w = int(succ[w][rng.randint(20)])
            out.append(words[w])
        if force_rare is not None:
            out[rng.randint(len(out))] = force_rare
        return out

    # Random channel tilt: a short random FIR smears the spectrum per utt.
    def channel(wav):
        taps = rng.randn(rng.randint(2, 5)).astype(np.float32)
        taps /= np.abs(taps).sum()
        return np.convolve(wav, taps, mode="same").astype(np.float32)

    dirs = []
    for split, n in (("train", n_train), ("dev", n_dev), ("test", n_test)):
        d = root / split
        wav_dir = d / "wav"
        wav_dir.mkdir(parents=True, exist_ok=True)
        with DatadirWriter(d) as writer:
            for i in range(n):
                force = None
                if split == "train":
                    force = slot_of.get(i)
                elif split == "test":
                    force = rare[rng.randint(n_rare)]
                utt_words = sentence(int(rng.randint(4, 10)), force)
                f0 = rng.uniform(0.85, 1.2)
                rate = rng.uniform(0.85, 1.15)
                amp = rng.uniform(0.5, 1.2)
                segs = []
                for w in utt_words:
                    for u in lexicon[w]:
                        dur = int(fs * rng.uniform(0.045, 0.09) / rate)
                        segs.append(_unit_wave(u, f0, dur, fs, rng))
                    segs.append(np.zeros(int(fs * 0.015), np.float32))
                wav = amp * 0.3 * np.concatenate(segs)
                wav = channel(wav)
                wav = wav + rng.uniform(0.05, 0.12) * rng.randn(
                    len(wav)).astype(np.float32)
                uid = f"{split}_{i:05d}"
                path = wav_dir / f"{uid}.wav"
                write_wav(str(path), wav, fs)
                writer["wav.scp"][uid] = str(path)
                writer["text"][uid] = " ".join(utt_words)
        dirs.append(d)
    (root / "rare_words.txt").write_text("\n".join(rare) + "\n")
    _ensure_lm_text(root, words, n_common, seed)
    return tuple(dirs) + (rare,)


def _ensure_lm_text(root: Path, words, n_common: int, seed: int,
                    n_sent: int = 100_000):
    """Text-only LM corpus, 10x the transcribed set, same bigram grammar.

    Real recipes train the fusion LM on far more text than the AM ever
    hears (asr.sh stage 6-8 uses external LM corpora) — that asymmetry is
    WHY shallow fusion helps. Trained on the AM's own 10k transcripts the
    LM knows nothing the decoder's implicit LM doesn't, and fusion only
    double-counts the grammar (observed r4: monotonic WER degradation with
    fusion weight). The generator re-derives the same successor graph from
    the corpus seed.
    """
    out = root / "lm_train.text"
    if out.exists():
        return
    rng = np.random.RandomState(seed)
    # replay the exact rng call sequence of make_hard_corpus up to `succ`
    for w in words:
        rng.randint(0, N_UNITS, size=rng.randint(2, 6))
    succ = {i: rng.choice(n_common, size=20, replace=False, p=None)
            for i in range(n_common)}
    zipf = 1.0 / np.arange(1, n_common + 1)
    zipf /= zipf.sum()
    gen = np.random.RandomState(seed + 1)
    rare = words[n_common:]
    lines = []
    for i in range(n_sent):
        n_words = int(gen.randint(4, 10))
        w = int(gen.choice(n_common, p=zipf))
        sent = [words[w]]
        for _ in range(n_words - 1):
            w = int(succ[w][gen.randint(20)])
            sent.append(words[w])
        # Rare words occur in real LM corpora too — rarely. Without them
        # fusion VETOES every rare word (observed: rare WER 97 -> 100%
        # with fusion on a rare-free LM text). ~5% of sentences carry one,
        # giving each rare word ~15 occurrences in 100k sentences: alive
        # but still 300x rarer than the common head.
        if rare and gen.rand() < 0.05:
            sent[gen.randint(len(sent))] = rare[gen.randint(len(rare))]
        # kaldi text format (uid first column) so LMTask/train_arpa read it
        lines.append(f"lm_{i:06d} " + " ".join(sent))
    out.write_text("\n".join(lines) + "\n")


# Per-batch biasing for the TCPGen arm lives in the framework now:
# slu/kb.py TCPGenBatchAugmenter (KBmeetingTrain + PtrSche analogue).


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="exp/ablations")
    p.add_argument("--corpus", default="exp/ablations/corpus")
    p.add_argument("--n_train", type=int, default=10000)
    p.add_argument("--max_epoch", type=int, default=25)
    p.add_argument("--mbr_epochs", type=int, default=3)
    p.add_argument("--skip", nargs="*", default=[],
                   help="subset of {lm,ngram,tcpgen,mbr} to skip")
    p.add_argument("--compositional", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="grapheme-acoustic lexicon (see make_hard_corpus)")
    args = p.parse_args(argv)

    import jax
    from ..models.asr_model import ASRConfig, ASRModel
    from ..ops.specaug import SpecAugConfig
    from ..tasks.asr import ASRTask, ASRTaskConfig, DataConfig, Speech2Text
    from ..train.mbr import MBRConfig
    from ..train.optim import OptimConfig
    from ..utils.metrics import error_rate, rare_word_error_rate

    t0 = time.time()
    train_dir, dev_dir, test_dir, rare = make_hard_corpus(
        args.corpus, n_train=args.n_train,
        compositional=args.compositional)
    log.info("corpus ready (%.1fs)", time.time() - t0)

    out = Path(args.out)
    base_exp = out / "exp_base"
    model_kw = dict(
        d_model=144, n_head=4, d_ff=576, num_encoder_blocks=6,
        num_decoder_blocks=2, decoder_d_ff=576, kernel_size=15,
        dropout_rate=0.1, ctc_weight=0.3, use_mvn="utterance",
        specaug=SpecAugConfig(freq_mask_width_range=(0, 10),
                              time_mask_width_range=(0, 25)),
        dtype="bfloat16")
    data_kw = dict(train_dir=str(train_dir), valid_dir=str(dev_dir),
                   token_type="bpe", bpe_vocab_size=400,
                   # Suffix-marked pieces ('ca t▁') — the fork's TCPGen
                   # dictionary convention (bpe_dict_unigram600suffix.txt):
                   # word ends are past-observable, so the biasing walk's
                   # pointer mask is identical in training and beam search.
                   bpe_marker="suffix",
                   # Fixed-B sorted batching + coarse buckets: the r4/r5
                   # numel config produced ~100 distinct (B, T, U) train
                   # shapes, and over the axon tunnel every shape costs a
                   # remote compile PLUS a ~50 MB executable fetch
                   # (~1/min observed) — epoch 1 alone ran for an hour.
                   # Constant B x 5 speech buckets x 2 text buckets
                   # compiles ~10 programs total; the padding waste is
                   # noise next to that.
                   batch_type="sorted", batch_size=48,
                   speech_bucket_multiple=16384, text_bucket_multiple=32,
                   # waveforms live in HBM; the tunnel ships only tokens
                   resident_corpus=True)
    cfg = ASRTaskConfig(
        exp_dir=str(base_exp), model=ASRConfig(**model_kw),
        optim=OptimConfig(lr=2e-3, scheduler="warmuplr", warmup_steps=1500),
        data=DataConfig(**data_kw),
        max_epoch=args.max_epoch, keep_nbest=10, nbest_average=5,
        log_interval=50)
    log.info("=== base training ===")
    ASRTask.train(cfg)

    refs = read_2column_text(Path(test_dir) / "text")
    wavs = read_2column_text(Path(test_dir) / "wav.scp")
    loaded = sorted(((u, load_wav(pth)[0]) for u, pth in wavs.items()),
                    key=lambda x: len(x[1]))
    dev_refs = read_2column_text(Path(dev_dir) / "text")
    dev_wavs = read_2column_text(Path(dev_dir) / "wav.scp")
    dev_loaded = sorted(((u, load_wav(pth)[0])
                         for u, pth in dev_wavs.items()),
                        key=lambda x: len(x[1]))

    # One decode shape per model family: every chunk is exactly 16 utts
    # (tail padded with repeats) and every waveform pads to the corpus
    # max bucket — each distinct shape costs a remote compile + ~50 MB
    # executable fetch over the tunnel, so fewer shapes beats tighter
    # padding here.
    max_t = max(len(x) for _, x in loaded + dev_loaded)
    decode_bucket = -(-max_t // 16384) * 16384

    def run_decode(s2t, utts):
        hyps = {}
        for i in range(0, len(utts), 16):
            chunk = utts[i:i + 16]
            while len(chunk) < 16:  # pad: duplicate uids overwrite
                chunk = chunk + [chunk[-1]]
            for (u, _), txt in zip(
                    chunk, s2t.decode_batch([x for _, x in chunk])):
                hyps[u] = txt
        return hyps

    def make_s2t(exp_dir, beam, **kw):
        return Speech2Text(str(exp_dir), beam_size=beam, ctc_weight=0.3,
                           max_len=24, decode_bucket_multiple=decode_bucket,
                           **kw)

    def decode(exp_dir, beam, _loaded=None, **kw):
        # The remote-TPU transport (axon tunnel) occasionally drops a
        # compile RPC mid-campaign; retry the arm from scratch rather than
        # lose hours of training above it.
        utts = loaded if _loaded is None else _loaded
        for attempt in range(3):
            try:
                return run_decode(make_s2t(exp_dir, beam, **kw), utts)
            except Exception as e:  # noqa: BLE001 - transport flake
                if attempt == 2:
                    raise
                log.warning("decode attempt %d failed (%s); retrying",
                            attempt + 1, e)
                time.sleep(20.0)

    results_json = out / "results.json"
    results = (json.loads(results_json.read_text())
               if results_json.exists() else {})

    def score(tag, hyps):
        wer, _ = error_rate(refs, hyps, "word")
        rare_wer, common_wer, _, _ = rare_word_error_rate(refs, hyps, rare)
        results[tag] = {"wer": wer, "rare_wer": rare_wer,
                        "common_wer": common_wer}
        results_json.write_text(json.dumps(results, indent=1))
        log.info("%s: WER %.2f%% rare %.2f%% common %.2f%%",
                 tag, wer * 100, rare_wer * 100, common_wer * 100)

    def arm(tag, make_hyps):
        """Skip arms already scored (crash-resumable campaign)."""
        if tag in results:
            log.info("%s: cached %s", tag, results[tag])
            return
        score(tag, make_hyps())

    log.info("=== decode: greedy vs beam ===")
    arm("greedy", lambda: decode(base_exp, beam=1))
    arm("beam10", lambda: decode(base_exp, beam=10))

    if "lm" not in args.skip:
        log.info("=== LM fusion ===")
        from ..tasks.lm import LMDataConfig, LMTask, LMTaskConfig
        from ..models.lm import LMConfig
        lm_exp = out / "exp_lm"
        lm_exp.mkdir(parents=True, exist_ok=True)
        # share the ASR vocab so fused scores index the same token ids
        shutil.copy(base_exp / "tokens.txt", lm_exp / "tokens.txt")
        # Train on the 100k-sentence text-only corpus (the external-LM-data
        # asymmetry that makes shallow fusion pay in real recipes).
        lm_text = Path(args.corpus) / "lm_train.text"
        lm_cfg = LMTaskConfig(
            exp_dir=str(lm_exp),
            model=LMConfig(arch="transformer", d_model=128, n_head=4,
                           d_ff=512, num_blocks=4, dropout_rate=0.1),
            optim=OptimConfig(lr=1e-3, scheduler="warmuplr",
                              warmup_steps=500),
            data=LMDataConfig(train_text=str(lm_text),
                              valid_text=str(Path(dev_dir) / "text"),
                              token_type="bpe",
                              bpemodel=str(base_exp / "bpe.json"),
                              bpe_marker="suffix",
                              batch_size=256),
            max_epoch=4, keep_nbest=2)
        LMTask.train(lm_cfg)
        # Tune the fusion weight on DEV (standard recipe practice), report
        # the TEST decode at the selected weight.
        if "lm_weight" not in results:
            # Joint sweep of fusion weight x internal-LM subtraction
            # (density-ratio fusion, decode/beam.py ilm_weight): plain
            # shallow fusion double-counts the grammar the decoder already
            # internalized; subtracting the zero-memory decoder's internal
            # LM is what makes the external LM pay. ONE Speech2Text with
            # sweep_fusion=True: the weights are traced inputs, so the
            # whole sweep costs a single compile.
            s2t = make_s2t(base_exp, beam=10, lm_exp_dir=str(lm_exp),
                           lm_weight=0.1, sweep_fusion=True)
            best, best_wer = (0.0, 0.0), None
            for w, ilm in ((0.1, 0.0), (0.2, 0.0), (0.2, 0.1), (0.3, 0.15),
                           (0.3, 0.3), (0.4, 0.2), (0.5, 0.4)):
                s2t.set_fusion_weights(lm_weight=w, ilm_weight=ilm)
                dev_hyps = run_decode(s2t, dev_loaded)
                dev_wer, _ = error_rate(dev_refs, dev_hyps, "word")
                log.info("lm sweep w=%.2f ilm=%.2f dev WER %.2f%%",
                         w, ilm, dev_wer * 100)
                if best_wer is None or dev_wer < best_wer:
                    best, best_wer = (w, ilm), dev_wer
            results["lm_weight"], results["lm_ilm_weight"] = best
            results_json.write_text(json.dumps(results, indent=1))
        arm("beam10_lm",
            lambda: decode(base_exp, beam=10, lm_exp_dir=str(lm_exp),
                           lm_weight=results["lm_weight"],
                           sweep_fusion=True,
                           ilm_weight=results.get("lm_ilm_weight", 0.0)))

    if "ngram" not in args.skip:
        # Count-based BPE-token 3-gram via the in-framework lmplz analogue
        # (decode/ngram_train.py): the corpus grammar IS a bigram model
        # over words, so a count LM is the matched-capacity fusion arm
        # (reference: KenLM-trained ngram via scorers/ngram.py).
        log.info("=== n-gram fusion ===")
        from ..data.tokenizer import build_tokenizer
        from ..decode.ngram_train import train_arpa_from_file
        arpa = out / "train_bpe3.arpa"
        if not arpa.exists():
            tok = build_tokenizer("bpe", bpemodel=str(base_exp / "bpe.json"),
                                  bpe_marker="suffix")
            # Count on the text-only LM corpus (see lm arm) — plain lines,
            # not the uid-prefixed datadir text file.
            lm_text = Path(args.corpus) / "lm_train.text"
            train_arpa_from_file(lm_text, arpa, order=3,
                                 tokenizer=tok.text2tokens)
        if "ngram_weight" not in results:
            s2t = make_s2t(base_exp, beam=10, ngram_file=str(arpa),
                           ngram_weight=0.1, sweep_fusion=True)
            best, best_wer = (0.1, 0.0), None
            for w, ilm in ((0.1, 0.0), (0.2, 0.0), (0.2, 0.1), (0.3, 0.15),
                           (0.3, 0.3), (0.5, 0.3)):
                s2t.set_fusion_weights(ngram_weight=w, ilm_weight=ilm)
                dev_hyps = run_decode(s2t, dev_loaded)
                dev_wer, _ = error_rate(dev_refs, dev_hyps, "word")
                log.info("ngram sweep w=%.2f ilm=%.2f dev WER %.2f%%",
                         w, ilm, dev_wer * 100)
                if best_wer is None or dev_wer < best_wer:
                    best, best_wer = (w, ilm), dev_wer
            results["ngram_weight"], results["ngram_ilm_weight"] = best
            results_json.write_text(json.dumps(results, indent=1))
        arm("beam10_ngram",
            lambda: decode(base_exp, beam=10, ngram_file=str(arpa),
                           ngram_weight=results["ngram_weight"],
                           sweep_fusion=True,
                           ilm_weight=results.get("ngram_ilm_weight", 0.0)))

    if "tcpgen" not in args.skip:
        log.info("=== TCPGen training ===")
        from ..data.tokenizer import TokenIDConverter, build_tokenizer
        from ..slu.kb import TCPGenBatchAugmenter, boundary_token_ids
        tcp_exp = out / "exp_tcpgen"
        # Fine-tune from the base run's averaged weights (the reference's
        # PtrSche=20 staging: the pointer only ever trains against a
        # competent model — training it from scratch collapses the
        # generation gate long before the decoder is any good).
        tcp_cfg = dataclasses.replace(
            cfg, exp_dir=str(tcp_exp),
            model=ASRConfig(use_tcpgen=True, tcpgen_ptr_loss_weight=1.0,
                            tcpgen_gate_loss_weight=0.2, **model_kw),
            data=DataConfig(bpemodel=str(base_exp / "bpe.json"), **{
                k: v for k, v in data_kw.items() if k != "bpemodel"}),
            # fine-tune LR: 5e-4 constant destabilized the from-scratch r4
            # run (grad_norm 4 -> 512); 2e-4 + the trainer divergence guard
            # keep the warm-started model in its basin.
            optim=OptimConfig(lr=2e-4, scheduler="constant"),
            init_params_from=str(base_exp / "valid.loss.ave_5best"),
            max_epoch=10, keep_nbest=5, nbest_average=3)
        # share the base vocab so tries/ids line up
        tcp_exp.mkdir(parents=True, exist_ok=True)
        shutil.copy(base_exp / "tokens.txt", tcp_exp / "tokens.txt")
        tokenizer = build_tokenizer("bpe", bpemodel=str(base_exp / "bpe.json"),
                                    bpe_marker="suffix")
        converter = TokenIDConverter(tcp_exp / "tokens.txt")
        # f30-analogue biasing vocabulary (fork: data/KB/rarewords_f30.txt,
        # every word under a train-frequency threshold): the rare eval set
        # alone is too sparse for the generation gate to learn WHEN to
        # point; the broader tail supplies the positive steps.
        from collections import Counter
        wc = Counter(w for t in read_2column_text(
            Path(train_dir) / "text").values() for w in t.split())
        bias_vocab = sorted(set(w for w, n in wc.items() if n <= 30)
                            | set(rare))
        log.info("biasing vocabulary: %d words (rare eval: %d)",
                 len(bias_vocab), len(rare))
        pieces = [converter.tokens2ids(tokenizer.text2tokens(w))
                  for w in bias_vocab]
        bset, prefix = boundary_token_ids(converter.token_list)
        # Fork recipe: per-batch 20-word lists (present + distractors),
        # DBdrop 0.3, pointer ramp over the first epochs
        # (conf/train_slu_tcpgen_gcn.yaml + decoders.py:777).
        aug = TCPGenBatchAugmenter(
            pieces, bset, tcp_cfg.model.sos_id, tcp_cfg.model.eos_id,
            prefix_boundary=prefix, kb_len=30, db_drop=0.3,
            sched_epochs=3, seed=7)

        class Task(ASRTask):
            @classmethod
            def build_iter_factory(cls, cfg_, dataset, shuffle=True,
                                   rank=0, world=1, batch_divisor=0, **kw):
                base = ASRTask.build_iter_factory(
                    cfg_, dataset, shuffle=shuffle, rank=rank, world=world,
                    batch_divisor=batch_divisor, **kw)
                return aug.wrap(base)

        Task.train(tcp_cfg)
        arm("tcpgen_nobias", lambda: decode(tcp_exp, beam=10))
        arm("tcpgen_bias",
            lambda: decode(tcp_exp, beam=10, biasing_words=bias_vocab))
        # Diagnostic arm (not a pass/fail gate): pin p_gen at decode to
        # separate gate-collapse failures from trie-walk misalignment —
        # if forcing recovers rare words the gate is the problem; if not,
        # the walk/trie is.
        arm("tcpgen_bias_forcegen",
            lambda: decode(tcp_exp, beam=10, biasing_words=bias_vocab,
                           tcpgen_force_p_gen=0.3))

    if "mbr" not in args.skip:
        log.info("=== MBR fine-tune ===")
        # Fine-tune from the base run's AVERAGED weights with a fresh
        # low-LR optimizer — resuming the base's latest checkpoint
        # resumes whatever late-training instability it ended on
        # (observed: 25epoch at valid loss 30 vs 2.8 best -> 125% WER).
        mbr_exp = out / "exp_mbr"
        mbr_exp.mkdir(parents=True, exist_ok=True)
        shutil.copy(base_exp / "tokens.txt", mbr_exp / "tokens.txt")
        mbr_cfg = dataclasses.replace(
            cfg, exp_dir=str(mbr_exp),
            data=DataConfig(bpemodel=str(base_exp / "bpe.json"), **{
                k: v for k, v in data_kw.items() if k != "bpemodel"}),
            optim=OptimConfig(lr=1e-4, scheduler="constant"),
            init_params_from=str(base_exp / "valid.loss.ave_5best"),
            mbr=MBRConfig(weight=0.5, beam_size=4, max_len=24),
            max_epoch=args.mbr_epochs, keep_nbest=args.mbr_epochs,
            nbest_average=1)
        ASRTask.train(mbr_cfg)
        # Decode the FINE-TUNED weights (latest epoch): the MBR epochs
        # raise valid CE loss by construction, so a valid-loss n-best
        # average could silently prefer the earliest fine-tune epoch.
        arm("mbr_beam10", lambda: decode(
            mbr_exp, beam=10, ckpt_name=f"{args.mbr_epochs}epoch"))

    lines = [
        "# RESULTS — ablations on the hard synthetic corpus",
        "",
        f"Corpus: {args.n_train} train / 200 dev / 400 test utts, "
        "1000-word Zipf vocab (300-word rare tail, 1-3 train occurrences "
        "each, >= 1 rare word per test utt), sparse bigram grammar, "
        "noise 0.05-0.12 + random channel tilt "
        "(recipe/ablation_run.py:make_hard_corpus).",
        f"Base model: Conformer 6x144 + Transformer 2x144, BPE-400, CTC "
        f"0.3, SpecAug, bf16, {args.max_epoch} epochs on "
        f"{jax.devices()[0].platform}.",
        "",
        "| setup | WER | rare-word WER | common WER |",
        "|---|---|---|---|",
    ]
    for tag, r in results.items():
        if not isinstance(r, dict):  # scalar records (lm_weight sweep pick)
            lines.append(f"| {tag} = {r} | | | |")
            continue
        lines.append(f"| {tag} | {r['wer'] * 100:.2f}% | "
                     f"{r['rare_wer'] * 100:.2f}% | "
                     f"{r['common_wer'] * 100:.2f}% |")
    lines += [
        "",
        "Expected directions: beam10 < greedy; +LM < beam10 and "
        "+ngram < beam10 (the corpus grammar IS a bigram model); "
        "tcpgen_bias rare-word WER < tcpgen_nobias AND < beam10; "
        "mbr_beam10 <= beam10 (decoded at the fine-tuned checkpoint).",
        "",
        json.dumps(results),
    ]
    out.mkdir(parents=True, exist_ok=True)
    (out / "RESULTS_ABLATIONS.md").write_text("\n".join(lines) + "\n")
    log.info("wrote %s (total %.0fs)", out / "RESULTS_ABLATIONS.md",
             time.time() - t0)

    # Self-checking campaign (VERDICT r4 #2): every arm must land inside a
    # band of the base arm, and each feature must move its metric in the
    # claimed direction — otherwise exit non-zero naming the regression,
    # instead of silently recording a broken arm (the r4 mbr arm decoded a
    # diverged checkpoint at WER 125% and nothing caught it).
    failures = []

    def check(name, cond):
        (log.info if cond else log.error)(
            "CHECK %s: %s", "PASS" if cond else "FAIL", name)
        if not cond:
            failures.append(name)

    base = results.get("beam10")
    if base:
        for tag in ("beam10_lm", "beam10_ngram", "tcpgen_nobias",
                    "tcpgen_bias", "mbr_beam10"):
            if tag in results:
                check(f"{tag} WER within band of beam10 "
                      f"({results[tag]['wer']:.4f} vs {base['wer']:.4f})",
                      results[tag]["wer"] <= base["wer"] * 1.5 + 0.02)
        if "greedy" in results:
            check("beam10 <= greedy", base["wer"]
                  <= results["greedy"]["wer"] + 0.002)
        if "beam10_lm" in results:
            check("LM fusion helps (beam10_lm < beam10)",
                  results["beam10_lm"]["wer"] < base["wer"])
        if "beam10_ngram" in results:
            check("ngram fusion does not hurt (<= beam10 + 0.2pt)",
                  results["beam10_ngram"]["wer"] <= base["wer"] + 0.002)
        if "mbr_beam10" in results:
            check("MBR fine-tune <= beam10 + 0.25pt",
                  results["mbr_beam10"]["wer"] <= base["wer"] + 0.0025)
        if "tcpgen_bias" in results and "tcpgen_nobias" in results:
            # The fork's acceptance criterion: biasing must cut rare-word
            # WER vs both the unbiased decode of the same model and the
            # plain baseline, and must be meaningfully below 100%.
            rb = results["tcpgen_bias"]["rare_wer"]
            check(f"tcpgen_bias rare WER ({rb:.3f}) < tcpgen_nobias "
                  f"({results['tcpgen_nobias']['rare_wer']:.3f})",
                  rb < results["tcpgen_nobias"]["rare_wer"])
            check(f"tcpgen_bias rare WER ({rb:.3f}) < beam10 "
                  f"({base['rare_wer']:.3f})", rb < base["rare_wer"])
            check(f"tcpgen_bias rare WER ({rb:.3f}) meaningfully < 100%",
                  rb < 0.95)
    if failures:
        log.error("ablation campaign FAILED %d check(s): %s",
                  len(failures), "; ".join(failures))
        return 1
    log.info("ablation campaign: all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
