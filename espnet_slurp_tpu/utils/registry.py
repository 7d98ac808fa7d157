"""Component registries — the ClassChoices plugin mechanism.

Parity target: reference espnet2/train/class_choices.py (string -> class
indirection behind every `--encoder conformer --encoder_conf ...` flag).
Components self-register at import; user code can register new ones:

    from espnet_slurp_tpu.utils.registry import encoders

    @encoders.register("my_encoder")
    class MyEncoder(nn.Module): ...

and select them via config (`model: {encoder: my_encoder}`).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, TypeVar

T = TypeVar("T")


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._map: Dict[str, type] = {}

    def register(self, key: str) -> Callable[[T], T]:
        def deco(cls: T) -> T:
            if key in self._map:
                raise ValueError(f"{self.name}:{key} already registered")
            self._map[key] = cls
            return cls
        return deco

    def add(self, key: str, cls) -> None:
        self.register(key)(cls)

    def get(self, key: str):
        if key not in self._map:
            raise KeyError(
                f"unknown {self.name} {key!r}; choices: {self.choices()}")
        return self._map[key]

    def choices(self) -> Iterable[str]:
        return sorted(self._map)

    def __contains__(self, key: str) -> bool:
        return key in self._map


encoders = Registry("encoder")
decoders = Registry("decoder")
separators = Registry("separator")
tts_models = Registry("tts_model")
lm_archs = Registry("lm_arch")
