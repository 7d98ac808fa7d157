"""Dynamic mixing: synthesize separation training mixtures on the fly.

Parity target: espnet2/train/preprocessor.py:586-726
(DynamicMixingPreprocessor) wired by espnet2/tasks/enh.py:316-377
(--dynamic_mixing / --dynamic_mixing_gain_db / utt2spk). Instead of a
fixed premixed corpus, every epoch draws fresh (n_spk-1) interferer
utterances per anchor source — different speakers where an utt2spk map is
given — applies a random per-source gain in ±gain_db, and sums them into
the mixture. References are emitted alongside so the PIT criterion sees
consistent (mixture, sources) pairs.

Host-side (numpy) by design, like the reference: mixing happens in the
data pipeline before collation, so the jitted train step keeps its static
(speech_mix, speech_ref) signature.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..data.fileio import load_wav, read_2column_text


class DynamicMixer:
    """Preprocess hook for SpeechDataset over a single 'spk1' source stream.

    Consumes {'spk1': waveform} and returns
    {'speech_mix': mix, 'spk1': g1*anchor, ..., 'spkN': gN*interferer}.
    """

    def __init__(self, source_scp: str, n_spk: int = 2,
                 gain_db: float = 0.0, utt2spk: Optional[str] = None,
                 seed: int = 0):
        self.sources = read_2column_text(source_scp)
        self.keys = sorted(self.sources)
        if len(self.keys) < n_spk:
            raise ValueError(
                f"dynamic mixing needs >= n_spk={n_spk} sources, "
                f"got {len(self.keys)}")
        # without utt2spk every utterance counts as its own speaker
        # (preprocessor.py:622-631 dummy utt2spk)
        self.utt2spk = (read_2column_text(utt2spk) if utt2spk
                        else {k: k for k in self.keys})
        self.n_spk = n_spk
        self.gain_db = gain_db
        self._rng = np.random.RandomState(seed)

    def _pick(self, uid: str):
        """(n_spk-1) interferer uids: unique utterances, unique speakers
        where possible (preprocessor.py:638-665 retry-then-give-up)."""
        rng = self._rng
        picked = [uid]
        spks = {self.utt2spk.get(uid, uid)}
        retries = 0
        while len(picked) < self.n_spk:
            k = self.keys[rng.randint(len(self.keys))]
            s = self.utt2spk.get(k, k)
            if (k not in picked and s not in spks) or retries > 10:
                picked.append(k)
                spks.add(s)
            else:
                retries += 1
        return picked[1:]

    @staticmethod
    def _fit(x: np.ndarray, n: int) -> np.ndarray:
        """Crop or loop-extend to exactly n samples (the reference
        reflect-pads, which fails when pad >= len; tiling is robust for
        arbitrarily short interferers)."""
        if len(x) >= n:
            return x[:n]
        return np.tile(x, -(-n // len(x)))[:n]

    def __call__(self, uid: str, data: Dict[str, object]
                 ) -> Dict[str, np.ndarray]:
        anchor = np.asarray(data["spk1"], np.float32)
        n = anchor.shape[0]
        refs = [anchor]
        for k in self._pick(uid):
            src, _ = load_wav(self.sources[k])
            refs.append(self._fit(np.asarray(src, np.float32), n))
        g = self.gain_db
        gains = 10.0 ** (self._rng.uniform(-g, g, size=len(refs)) / 20.0)
        refs = [r * gi for r, gi in zip(refs, gains)]
        out: Dict[str, np.ndarray] = {
            "speech_mix": np.sum(refs, axis=0).astype(np.float32)}
        for i, r in enumerate(refs):
            out[f"spk{i + 1}"] = r.astype(np.float32)
        return out
