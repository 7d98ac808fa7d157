"""Staged ASR recipe pipeline — the asr.sh analogue.

Parity target: reference egs2/TEMPLATE/asr1/asr.sh (1541 lines, 16 stages,
SURVEY.md §2.8). Stage numbering is preserved so recipe muscle-memory
transfers:

  1  data validation            (asr.sh stage 1: local data prep output)
  2  speed perturbation         (sox x0.9/1.0/1.1 -> resample_sinc copies)
  3  feature dump               (feats_type=fbank/fbank_pitch: log-mel
                                 [+log-F0] -> per-utt .npy + feats.scp;
                                 asr.sh:472-543 format_wav/fbank stage)
  4  length filtering           (min/max audio seconds)
  5  token list / BPE training
  7  LM training                (optional)
  8  LM perplexity
  10 collect-stats              (GlobalMVN feats stats)
  11 ASR training
  12 decoding
  13 scoring (WER/CER)
  14 pack                       (self-contained model.zip; asr.sh:1398-1447)
  15 unpack + verify            (unpacked dir decodes identically —
                                 the testable contract stage 16's upload
                                 relies on)

Stage 6 (lm data prep) is folded into 7; stage 16 (zenodo/HF upload) stays
a stub (no egress from this environment). Stage 3 is a no-op for
feats_type=raw (wavs are read directly on device).
"""
from __future__ import annotations

import dataclasses
import logging
import shutil
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.fileio import (DatadirWriter, load_wav, read_2column_text,
                           write_wav)
from ..ops.resample import speed_perturb
from ..tasks.asr import ASRTask, ASRTaskConfig, Speech2Text
from ..utils.config import save_yaml
from ..utils.metrics import error_rate

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass
class PipelineOptions:
    speed_perturb_factors: tuple = ()      # e.g. (0.9, 1.0, 1.1)
    # "raw" | "fbank" | "fbank_pitch" (asr.sh feats_type). Non-raw runs
    # stage 3: dump log-mel (+log-F0) features and train from the dump via
    # the npy loader with model.input_feats=True.
    feats_type: str = "raw"
    min_audio_sec: float = 0.05
    max_audio_sec: float = 30.0
    fs: int = 16000
    train_lm: bool = False
    # Stage 9 (asr.sh ngram stage): train an in-framework ARPA n-gram
    # (decode/ngram_train.py lmplz analogue) + compiled binary cache, and
    # fuse it in the decode stage with this weight.
    train_ngram: bool = False
    ngram_order: int = 3
    ngram_weight: float = 0.3
    decode_beam_size: int = 5
    decode_ctc_weight: float = 0.3
    decode_max_len: int = 128
    decode_batch_size: int = 8


def validate_data_dir(d: str | Path) -> int:
    """Stage 1: check wav.scp/text agreement; returns #utts."""
    d = Path(d)
    wavs = read_2column_text(d / "wav.scp")
    texts = read_2column_text(d / "text")
    if set(wavs) != set(texts):
        raise RuntimeError(
            f"{d}: wav.scp/text utterance mismatch "
            f"({len(wavs)} vs {len(texts)})")
    return len(wavs)


def stage2_speed_perturb(src_dir: str | Path, out_dir: str | Path,
                         factors=(0.9, 1.0, 1.1), fs: int = 16000) -> Path:
    """Write a combined data dir with sp-prefixed copies (asr.sh:448-468)."""
    src, out = Path(src_dir), Path(out_dir)
    wav_out = out / "wav"
    wav_out.mkdir(parents=True, exist_ok=True)
    wavs = read_2column_text(src / "wav.scp")
    texts = read_2column_text(src / "text")
    with DatadirWriter(out) as w:
        for uid, path in wavs.items():
            for f in factors:
                if f == 1.0:
                    nuid, npath = uid, path
                else:
                    nuid = f"sp{f}-{uid}"
                    npath = str(wav_out / f"{nuid}.wav")
                    x, sr = load_wav(path)
                    write_wav(npath, speed_perturb(x, f), sr)
                w["wav.scp"][nuid] = npath
                w["text"][nuid] = texts[uid]
    return out


def stage3_dump_feats(src_dir: str | Path, out_dir: str | Path,
                      frontend_cfg, feats_type: str = "fbank") -> Path:
    """Dump log-mel (+log-F0) features to per-utt .npy + feats.scp.

    asr.sh:472-543 (feats_type=fbank_pitch: Kaldi make_fbank_pitch) — here
    the same on-device frontend the raw path uses computes the dump, so
    dumped-vs-on-the-fly training see identical features. Copies text and
    preserves wav.scp (so downstream stages can still reach the audio).
    """
    import jax.numpy as jnp
    from ..ops.frontend import default_frontend
    from ..ops.pitch import autocorr_f0
    src, out = Path(src_dir), Path(out_dir)
    feat_dir = out / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)
    wavs = read_2column_text(src / "wav.scp")
    texts = read_2column_text(src / "text")
    with DatadirWriter(out) as w:
        for uid, path in wavs.items():
            x, sr = load_wav(path)
            wav = jnp.asarray(x, jnp.float32)[None]
            lens = jnp.asarray([len(x)], jnp.int32)
            feats, flens = default_frontend(wav, lens, frontend_cfg)
            t = int(flens[0])
            mat = np.asarray(feats)[0, :t]
            if feats_type == "fbank_pitch":
                f0 = autocorr_f0(wav, lens, fs=frontend_cfg.fs,
                                 frame_length=frontend_cfg.n_fft,
                                 hop=frontend_cfg.hop_length)
                f0 = np.asarray(f0)[0]
                f0 = np.pad(f0, (0, max(0, t - len(f0))))[:t]
                mat = np.concatenate([mat, f0[:, None]], axis=1)
            npy = feat_dir / f"{uid}.npy"
            np.save(npy, mat.astype(np.float32))
            w["feats.scp"][uid] = str(npy)
            w["wav.scp"][uid] = path
            w["text"][uid] = texts[uid]
    log.info("stage3: dumped %s features for %d utts -> %s", feats_type,
             len(wavs), out)
    return out


def stage4_filter(src_dir: str | Path, out_dir: str | Path,
                  min_sec: float, max_sec: float, fs: int) -> Path:
    """Length filtering (asr.sh:575)."""
    src, out = Path(src_dir), Path(out_dir)
    wavs = read_2column_text(src / "wav.scp")
    texts = read_2column_text(src / "text")
    feats = (read_2column_text(src / "feats.scp")
             if (src / "feats.scp").exists() else None)
    kept = 0
    with DatadirWriter(out) as w:
        for uid, path in wavs.items():
            x, sr = load_wav(path)
            sec = len(x) / sr
            if min_sec <= sec <= max_sec and texts[uid].strip():
                w["wav.scp"][uid] = path
                w["text"][uid] = texts[uid]
                if feats is not None:
                    w["feats.scp"][uid] = feats[uid]
                kept += 1
    log.info("stage4: kept %d/%d utts", kept, len(wavs))
    return out


def run_pipeline(cfg: ASRTaskConfig, opts: PipelineOptions = PipelineOptions(),
                 stage: int = 1, stop_stage: int = 13,
                 test_dirs: Optional[List[str]] = None,
                 mesh=None) -> Dict[str, float]:
    """Run stages [stage, stop_stage]. Returns scoring results (stage 13)."""
    results: Dict[str, float] = {}
    exp = Path(cfg.exp_dir)
    exp.mkdir(parents=True, exist_ok=True)
    work = exp / "data"
    train_dir = Path(cfg.data.train_dir)

    if stage <= 1 <= stop_stage:
        n = validate_data_dir(cfg.data.train_dir)
        validate_data_dir(cfg.data.valid_dir)
        log.info("stage1: %d train utts validated", n)

    if stage <= 2 <= stop_stage and opts.speed_perturb_factors:
        train_dir = stage2_speed_perturb(
            train_dir, work / "train_sp", opts.speed_perturb_factors,
            opts.fs)

    valid_dir = cfg.data.valid_dir
    if opts.feats_type in ("fbank", "fbank_pitch") \
            and stage <= 3 <= stop_stage:
        # Dumped dirs keep the source basename so decode/score result keys
        # (wer_<dirname>) stay stable across feats_type.
        train_dir = stage3_dump_feats(train_dir, work / "fbank" / "train",
                                      cfg.model.frontend, opts.feats_type)
        valid_dir = str(stage3_dump_feats(
            cfg.data.valid_dir,
            work / "fbank" / Path(cfg.data.valid_dir).name,
            cfg.model.frontend, opts.feats_type))
        # Flip the task to the precomputed-feature path: npy loader +
        # frontend bypass + frame-scale length bucketing.
        feats_dim = cfg.model.frontend.n_mels \
            + (1 if opts.feats_type == "fbank_pitch" else 0)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, input_feats=True,
                                      input_feats_dim=feats_dim),
            data=dataclasses.replace(
                cfg.data, feats_type=opts.feats_type,
                speech_bucket_multiple=max(
                    cfg.data.speech_bucket_multiple
                    // cfg.model.frontend.hop_length, 16)))

    if stage <= 4 <= stop_stage:
        train_dir = stage4_filter(train_dir, work / "train_filtered",
                                  opts.min_audio_sec, opts.max_audio_sec,
                                  opts.fs)

    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, train_dir=str(train_dir),
                                      valid_dir=str(valid_dir)))

    if stage <= 5 <= stop_stage:
        ASRTask.prepare_vocab(cfg)  # writes tokens.txt (+ bpe model)
        log.info("stage5: vocabulary ready")

    if opts.train_lm and stage <= 7 <= stop_stage:
        from ..models.lm import LMConfig
        from ..tasks.lm import LMDataConfig, LMTask, LMTaskConfig
        lm_cfg = LMTaskConfig(
            exp_dir=str(exp / "lm"),
            model=LMConfig(d_model=128, n_head=4, d_ff=512, num_blocks=4),
            data=LMDataConfig(train_text=str(Path(train_dir) / "text"),
                              valid_text=str(Path(cfg.data.valid_dir)
                                             / "text"),
                              token_type=cfg.data.token_type),
            max_epoch=min(cfg.max_epoch, 10))
        LMTask.train(lm_cfg)
        if stage <= 8 <= stop_stage:
            ppl = LMTask.perplexity(lm_cfg.exp_dir,
                                    str(Path(cfg.data.valid_dir) / "text"))
            results["lm_ppl"] = ppl
            log.info("stage8: LM ppl %.2f", ppl)

    ngram_file = None
    if opts.train_ngram and stage <= 9 <= stop_stage:
        # Train over the DECODE token units (the scorer fuses token ids),
        # like the reference's BPE-tokenized lmplz input (asr.sh stage 9).
        from ..decode.ngram import ArpaLM
        from ..decode.ngram_train import train_arpa
        tokenizer, conv, _ = ASRTask.prepare_vocab(cfg)
        sents = [tokenizer.text2tokens(t) for t in
                 read_2column_text(Path(train_dir) / "text").values()]
        arpa = exp / "train.arpa"
        train_arpa(sents, str(arpa), order=opts.ngram_order)
        ngram_file = str(exp / "train_ngram.npz")
        tok2id = {t: i for i, t in enumerate(conv.token_list)}
        sos = len(conv.token_list) - 1
        tok2id.setdefault("<s>", sos)
        tok2id.setdefault("</s>", sos)
        ArpaLM(str(arpa), tok2id, len(conv.token_list)).save_binary(
            ngram_file)
        log.info("stage9: ngram trained -> %s", ngram_file)

    if stage <= 10 <= stop_stage and cfg.model.use_mvn == "global":
        from ..train.collect_stats import collect_stats
        tokenizer, converter, _ = ASRTask.prepare_vocab(cfg)
        ds = ASRTask.build_dataset(str(train_dir), tokenizer, converter,
                                   feats_type=cfg.data.feats_type)
        factory = ASRTask.build_iter_factory(cfg, ds, shuffle=False)
        collect_stats(factory(1), cfg.model.frontend, exp / "stats",
                      input_feats=cfg.model.input_feats)
        log.info("stage10: feature stats collected")

    if stage <= 11 <= stop_stage:
        ASRTask.train(cfg, mesh=mesh)
        log.info("stage11: training done")

    if stage <= 12 <= stop_stage:
        s2t = Speech2Text(str(exp), beam_size=opts.decode_beam_size,
                          ctc_weight=opts.decode_ctc_weight,
                          max_len=opts.decode_max_len,
                          ngram_file=ngram_file,
                          ngram_weight=(opts.ngram_weight
                                        if ngram_file else 0.0))
        for dname in [cfg.data.valid_dir] + list(test_dirs or []):
            dname = Path(dname)
            out = exp / f"decode_{dname.name}"
            wavs = read_2column_text(dname / "wav.scp")
            hyps = {}
            # Length-sorted batched decode: batched beam search at B>1
            # (asr.sh parallelizes with nj shell jobs; here one device
            # runs the whole batch in a single search).
            loaded = sorted(((uid, load_wav(path)[0])
                             for uid, path in wavs.items()),
                            key=lambda x: len(x[1]))
            with DatadirWriter(out) as w:
                for i in range(0, len(loaded), opts.decode_batch_size):
                    chunk = loaded[i:i + opts.decode_batch_size]
                    texts = s2t.decode_batch([x for _, x in chunk])
                    for (uid, _), text in zip(chunk, texts):
                        hyps[uid] = text
                        w["text"][uid] = text
            if stage <= 13 <= stop_stage:
                refs = read_2column_text(dname / "text")
                wer, _ = error_rate(refs, hyps, "word")
                cer, _ = error_rate(refs, hyps, "char")
                results[f"wer_{dname.name}"] = wer
                results[f"cer_{dname.name}"] = cer
                with open(out / "score.txt", "w") as f:
                    f.write(f"WER {wer:.4f}\nCER {cer:.4f}\n")
                log.info("stage13 %s: WER %.2f%% CER %.2f%%", dname.name,
                         wer * 100, cer * 100)

    if stage <= 14 <= stop_stage:
        # Stage 14-15 (asr.sh:1398-1494 pack/upload analogue): pack the
        # model, unpack it into a SELF-CONTAINED dir, and verify the
        # unpacked model decodes identically to the training exp dir.
        # Zenodo/HF upload itself stays a stub (no egress); the round trip
        # is the testable contract the upload relies on.
        archive = pack(exp, exp / "model.zip")
        results["pack_path"] = str(archive)
        log.info("stage14: packed -> %s", archive)
    if stage <= 15 <= stop_stage:
        unpacked = unpack(exp / "model.zip", exp / "unpacked")
        s2t_u = Speech2Text(str(unpacked), beam_size=opts.decode_beam_size,
                            ctc_weight=opts.decode_ctc_weight,
                            max_len=opts.decode_max_len)
        s2t_o = Speech2Text(str(exp), beam_size=opts.decode_beam_size,
                            ctc_weight=opts.decode_ctc_weight,
                            max_len=opts.decode_max_len)
        wavs = read_2column_text(Path(cfg.data.valid_dir) / "wav.scp")
        sample = [load_wav(path)[0] for _, path in sorted(wavs.items())[:4]]
        hyp_u = s2t_u.decode_batch(sample)
        hyp_o = s2t_o.decode_batch(sample)
        results["unpack_decode_match"] = hyp_u == hyp_o
        if hyp_u != hyp_o:
            raise RuntimeError(
                f"stage15: unpacked model decode mismatch: {hyp_u} vs "
                f"{hyp_o}")
        log.info("stage15: unpacked model decodes identically (%d utts)",
                 len(sample))
    return results


def pack(exp_dir: str | Path, out_path: str | Path) -> Path:
    """Stage 14 analogue (espnet2/bin/pack.py, asr.sh:1398-1447): zip
    everything inference needs to run STANDALONE — config, vocab (tokens +
    bpe model), GlobalMVN stats, and the best checkpoint."""
    import zipfile
    exp = Path(exp_dir)
    out_path = Path(out_path)
    import json
    with zipfile.ZipFile(out_path, "w") as z:
        for name in ["config.yaml", "tokens.txt", "reporter.json",
                     "bpe.json", "stats/feats_stats.npz"]:
            p = exp / name
            if p.exists():
                z.write(p, name)
        # Preferred checkpoint: the averaged n-best dir; else the latest
        # epoch dir (exactly the resolution order Speech2Text uses).
        # latest.json is packed ONLY when the packed checkpoint is the
        # epoch dir it points at: an averaged-best archive carrying a
        # stale latest.json would make an unpacked exp_dir attempt resume
        # from a missing epoch dir (ASRTask.train restores when
        # latest.json exists) and suppress init_params_from warm starts.
        best = sorted(exp.glob("valid.*best"))[:1]
        if not best and (exp / "latest.json").exists():
            with open(exp / "latest.json") as f:
                best = [exp / f"{json.load(f)['epoch']}epoch"]
            z.write(exp / "latest.json", "latest.json")
        for ckpt in best:
            for f in ckpt.rglob("*"):
                if f.is_file():
                    z.write(f, str(f.relative_to(exp)))
    return out_path


def publish(archive: str | Path, name: str,
            zoo_dir: str | Path | None = None) -> Path:
    """Stage 16 analogue (asr.sh:1449-1494 upload_models / zenodo_upload):
    publish a packed model into the LOCAL model zoo — a content-addressed
    registry directory (ESPNET_SLURP_TPU_ZOO or
    ~/.cache/espnet_slurp_tpu/zoo) with an index.json of
    name -> {file, sha256, bytes}. No-egress: the registry plays the role
    of zenodo/HF hub; `fetch` is the from_pretrained counterpart."""
    import hashlib
    import json
    import os
    import shutil
    zoo = Path(zoo_dir or os.environ.get(
        "ESPNET_SLURP_TPU_ZOO",
        Path.home() / ".cache" / "espnet_slurp_tpu" / "zoo"))
    zoo.mkdir(parents=True, exist_ok=True)
    archive = Path(archive)
    digest = hashlib.sha256(archive.read_bytes()).hexdigest()
    dest = zoo / f"{name}.zip"
    shutil.copyfile(archive, dest)
    index_path = zoo / "index.json"
    index = (json.loads(index_path.read_text())
             if index_path.exists() else {})
    index[name] = {"file": dest.name, "sha256": digest,
                   "bytes": dest.stat().st_size}
    index_path.write_text(json.dumps(index, indent=1))
    return dest


def fetch(name: str, out_dir: str | Path,
          zoo_dir: str | Path | None = None) -> Path:
    """from_pretrained analogue: resolve `name` in the local model zoo,
    verify its sha256 against the registry index, and unpack it into a
    self-contained, decodable exp dir."""
    import hashlib
    import json
    import os
    zoo = Path(zoo_dir or os.environ.get(
        "ESPNET_SLURP_TPU_ZOO",
        Path.home() / ".cache" / "espnet_slurp_tpu" / "zoo"))
    index_path = zoo / "index.json"
    if not index_path.exists():
        raise FileNotFoundError(f"no model zoo index at {index_path}")
    index = json.loads(index_path.read_text())
    if name not in index:
        raise KeyError(f"model {name!r} not in zoo ({sorted(index)})")
    entry = index[name]
    archive = zoo / entry["file"]
    digest = hashlib.sha256(archive.read_bytes()).hexdigest()
    if digest != entry["sha256"]:
        raise ValueError(f"sha256 mismatch for {name}: registry "
                         f"{entry['sha256'][:12]}.. != file {digest[:12]}..")
    return unpack(archive, out_dir)


def unpack(archive: str | Path, out_dir: str | Path) -> Path:
    """Stage 15 analogue: extract a packed model and REBASE its config so
    the unpacked directory is self-contained (the archived config.yaml
    points at the training exp_dir; exp-relative assets — tokens.txt,
    bpe.json, stats — must resolve inside the unpack dir instead)."""
    import dataclasses as _dc
    import zipfile
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(archive) as z:
        z.extractall(out)
    cfg_path = out / "config.yaml"
    if cfg_path.exists():
        from ..tasks.asr import load_task_config
        cfg = load_task_config(cfg_path)
        cfg = _dc.replace(cfg, exp_dir=str(out))
        if (out / "bpe.json").exists():
            cfg = _dc.replace(
                cfg, data=_dc.replace(cfg.data,
                                      bpemodel=str(out / "bpe.json")))
        save_yaml(cfg, cfg_path)
    return out
