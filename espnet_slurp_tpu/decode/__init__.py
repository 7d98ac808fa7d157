"""Search / decoding: greedy, batched joint CTC/attention beam search."""
from .beam import BeamSearchConfig, batch_beam_search  # noqa: F401
from .greedy import attention_greedy_decode, ctc_greedy_decode  # noqa: F401
