"""Speech enhancement / separation."""
from .losses import pit_wrapper, si_snr_loss  # noqa: F401
from .model import EnhConfig, EnhModel  # noqa: F401
