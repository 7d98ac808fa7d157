"""TTS: Tacotron2, FastSpeech(1/2), Griffin-Lim vocoder."""
from .fastspeech import FastSpeech, FastSpeechConfig  # noqa: F401
from .fastspeech2 import FastSpeech2, FastSpeech2Config, length_regulate  # noqa: F401
from .tacotron2 import Tacotron2, Tacotron2Config  # noqa: F401
from .transformer_tts import (TransformerTTS,  # noqa: F401
                              TransformerTTSConfig)
from .vocoder import griffin_lim, istft  # noqa: F401
