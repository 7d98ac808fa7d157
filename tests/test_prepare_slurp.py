"""SLURP data-prep tests on a synthetic jsonl fixture."""
import json

import pytest

from espnet_slurp_tpu.data.fileio import read_2column_text
from espnet_slurp_tpu.recipe.prepare_slurp import (clean_transcript,
                                                   format_text,
                                                   parse_annotation,
                                                   prepare_slurp)


def test_clean_and_parse():
    assert clean_transcript("email @ john.") == "email at john"
    ents = parse_annotation("set [date : tomorrow] alarm [time : 8 AM]")
    assert ents == [("date", "tomorrow"), ("time", "8 am")]


def test_format_text():
    rec = {"sentence": "play yesterday by the beatles",
           "sentence_annotation":
               "play [song_name : yesterday] by [artist_name : the beatles]",
           "scenario": "play", "action": "music"}
    assert format_text(rec, "intent") == \
        "play_music play yesterday by the beatles"
    ent = format_text(rec, "entity")
    assert ent.startswith("play_music SEP artist_name FILL the beatles "
                          "SEP song_name FILL yesterday SEP ")


def test_prepare_slurp(tmp_path):
    slurp = tmp_path / "slurp"
    slurp.mkdir()
    rec = {"sentence": "wake me at five",
           "sentence_annotation": "wake me at [time : five]",
           "scenario": "alarm", "action": "set",
           "recordings": [{"file": "audio-1234567.flac"}]}
    for subset in ("train", "devel", "test"):
        with open(slurp / f"{subset}.jsonl", "w") as f:
            f.write(json.dumps(rec) + "\n")
    with open(slurp / "metadata.json", "w") as f:
        json.dump({"r": {"recordings":
                         {"audio-1234567.flac": {"usrid": "U1"}}}}, f)
    counts = prepare_slurp(str(slurp), "/audio", str(tmp_path / "data"))
    assert counts == {"train": 1, "devel": 1, "test": 1}
    text = read_2column_text(tmp_path / "data" / "train" / "text")
    uid, val = next(iter(text.items()))
    assert uid == "slurp_U1_1234567"
    assert val == "alarm_set SEP time FILL five SEP wake me at five"
    tr = read_2column_text(tmp_path / "data" / "train" / "transcript")
    assert tr[uid] == "wake me at five"
