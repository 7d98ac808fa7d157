"""Dataset over named streams + preprocessing.

Parity target: reference espnet2/train/dataset.py (ESPnetDataset: N named
(path, name, type) loaders -> per-utt dict) and espnet2/train/preprocessor.py
(CommonPreprocessor: tokenize text -> int ids). Supported loader types cover
the ones the recipes actually use: sound (wav.scp), npy, text, text_int.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from .fileio import NpyScpReader, SoundScpReader, read_2column_text
from .tokenizer import AbsTokenizer, TokenIDConverter

DATA_TYPES = {}


def _register(name):
    def deco(fn):
        DATA_TYPES[name] = fn
        return fn
    return deco


@_register("sound")
def _load_sound(path):
    return SoundScpReader(path)


@_register("npy")
def _load_npy(path):
    return NpyScpReader(path)


class _TextIntLoader(Mapping):
    def __init__(self, path):
        self._map = read_2column_text(path)

    def __getitem__(self, k):
        return np.array([int(x) for x in self._map[k].split()], dtype=np.int64)

    def __len__(self):
        return len(self._map)

    def __iter__(self):
        return iter(self._map)


DATA_TYPES["text_int"] = _TextIntLoader


class _TextLoader(Mapping):
    def __init__(self, path):
        self._map = read_2column_text(path)

    def __getitem__(self, k):
        return self._map[k]

    def __len__(self):
        return len(self._map)

    def __iter__(self):
        return iter(self._map)


DATA_TYPES["text"] = _TextLoader


class CommonPreprocessor:
    """Tokenize named text streams to int id arrays (preprocessor.py:123-332).

    ``text_names`` lists which streams are text needing tokenization; each may
    have its own tokenizer/converter (the SLU task adds a word-level
    'transcript' stream — SLUPreprocessor, preprocessor.py:335-414).
    """

    def __init__(self,
                 tokenizer: Optional[AbsTokenizer] = None,
                 converter: Optional[TokenIDConverter] = None,
                 text_names: Sequence[str] = ("text",),
                 extra: Optional[Dict[str, Tuple[AbsTokenizer,
                                                 TokenIDConverter]]] = None):
        self.tokenizer = tokenizer
        self.converter = converter
        self.text_names = tuple(text_names)
        self.extra = extra or {}

    def __call__(self, uid: str, data: Dict[str, object]) -> Dict[str, np.ndarray]:
        out = {}
        for name, value in data.items():
            if isinstance(value, str):
                if name in self.extra:
                    tok, conv = self.extra[name]
                elif name in self.text_names and self.tokenizer is not None:
                    tok, conv = self.tokenizer, self.converter
                else:
                    continue  # raw text stream left out of the batch
                ids = conv.tokens2ids(tok.text2tokens(value))
                out[name] = np.asarray(ids, dtype=np.int64)
            else:
                out[name] = value
        return out


class SpeechDataset:
    """Map-style dataset over named loaders (dataset.py:357-540 analogue)."""

    def __init__(self,
                 path_name_type_list: Sequence[Tuple[str, str, str]],
                 preprocess: Optional[Callable] = None):
        self.loaders: Dict[str, Mapping] = {}
        for path, name, typ in path_name_type_list:
            if typ not in DATA_TYPES:
                raise ValueError(f"unknown data type {typ}")
            self.loaders[name] = DATA_TYPES[typ](path)
        self.preprocess = preprocess
        first = next(iter(self.loaders.values()))
        self.keys: List[str] = sorted(first)
        for name, loader in self.loaders.items():
            missing = set(self.keys) - set(loader)
            if missing:
                raise RuntimeError(
                    f"stream {name} missing utts: {sorted(missing)[:5]}")

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, uid: str | int):
        if isinstance(uid, int):
            uid = self.keys[uid]
        data = {name: loader[uid] for name, loader in self.loaders.items()}
        if self.preprocess is not None:
            data = self.preprocess(uid, data)
        return uid, data
