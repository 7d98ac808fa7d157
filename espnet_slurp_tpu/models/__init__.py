"""Model zoo: encoders, decoders, task models."""
from .asr_model import ASRConfig, ASRModel, add_sos_eos, label_smoothing_loss  # noqa: F401
from .conformer import ConformerEncoder  # noqa: F401
from .transformer import TransformerDecoder, TransformerEncoder  # noqa: F401
