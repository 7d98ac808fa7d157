"""DSP and loss ops (jittable, TPU-first)."""
from .frontend import FrontendConfig, default_frontend  # noqa: F401
from .masks import attention_bias, causal_mask, length_mask  # noqa: F401
from .mel import logmel, mel_filterbank  # noqa: F401
from .normalize import global_mvn, global_mvn_params, utterance_mvn  # noqa: F401
from .specaug import SpecAugConfig, specaug  # noqa: F401
from .stft import stft, stft_out_lengths  # noqa: F401
from .ctc import ctc_loss, ctc_loss_mean, greedy_decode, collapse_repeats  # noqa: F401
