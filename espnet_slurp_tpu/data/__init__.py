"""Data pipeline: fileio, tokenizers, datasets, samplers, collation."""
from .collate import asr_batch, common_collate  # noqa: F401
from .dataset import CommonPreprocessor, SpeechDataset  # noqa: F401
from .fileio import (DatadirWriter, NpyScpReader, SoundScpReader,  # noqa: F401
                     load_wav, read_2column_text, write_wav)
from .sampler import (build_batches, bucket_length, epoch_shuffle,  # noqa: F401
                      read_shape_file, round_up, shard_batches)
from .tokenizer import (AbsTokenizer, BpeTokenizer, CharTokenizer,  # noqa: F401
                        TokenIDConverter, WordTokenizer, build_token_list,
                        build_tokenizer)
