"""Prompt-text parity for the VideoMME dataset builder.

The reference builder (scripts/utils/build_videomme_dataset.py:48-51,
79-81) fixes the exact prompt bytes the model sees; answer parity dies if
the builder drifts. These tests pin the rebuilt builder to the reference's
format strings (transcribed here as the expected values) and to its joint
question+subtitle token budget with end-truncation (:21-26).
"""

import importlib.util
import os

import pytest


def _load_builder():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "build_videomme_dataset.py",
    )
    spec = importlib.util.spec_from_file_location("build_videomme", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


builder = _load_builder()


ROW = {
    "videoID": "vid001",
    "video_id": "001",
    "question_id": "001-1",
    "question": "What color is the car?",
    "options": ["A. Red", "B. Blue", "C. Green", "D. Black"],
    "answer": "B",
    "duration": "short",
    "domain": "Knowledge",
    "sub_category": "Humanity",
    "task_type": "Perception",
}


def test_plain_question_format_is_reference_exact():
    # reference :48-51: "<video>%s\nOptions:\n%s\nAnswer with the option's
    # letter from the given choices directly." % (question, '\n'.join(options))
    expected = (
        "<video>What color is the car?\n"
        "Options:\n"
        "A. Red\nB. Blue\nC. Green\nD. Black\n"
        "Answer with the option's letter from the given choices directly."
    )
    assert builder.format_question(ROW["question"], ROW["options"]) == expected


def test_subtitle_question_format_is_reference_exact():
    # reference :79-81
    expected = (
        "<video>This video's subtitles are listed below:\n"
        "Hello there.\nSecond line.\n"
        "What color is the car?\n"
        "Options:\n"
        "A. Red\nB. Blue\nC. Green\nD. Black\n"
        "Answer with the option's letter from the given choices directly."
    )
    got = builder.format_subtitle_question(
        ROW["question"], ROW["options"], "Hello there.\nSecond line."
    )
    assert got == expected


def test_srt_parse_matches_pysubs2_semantics(tmp_path):
    """Cue text lines join with ' ' (pysubs2 \\N -> space, reference :16),
    cues join with '\\n' (:19), empty cues are skipped (:17-18)."""
    srt = (
        "1\n00:00:01,000 --> 00:00:02,000\nHello there.\n\n"
        "2\n00:00:03,000 --> 00:00:04,000\nTwo physical\nlines.\n\n"
        "3\n00:00:05,000 --> 00:00:06,000\n   \n\n"
        "4\n00:00:07,000 --> 00:00:08,000\nLast cue.\n"
    )
    p = tmp_path / "v.srt"
    p.write_text(srt)
    assert builder.load_subtitle(str(p)) == (
        "Hello there.\nTwo physical lines.\nLast cue."
    )
    assert builder.load_subtitle(str(tmp_path / "missing.srt")) == ""


class StubTokenizer:
    """Whitespace tokenizer with the HF call surface the builder uses."""

    class _Enc:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        return self._Enc(text.split())

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(ids)


def test_joint_subtitle_budget_cuts_from_the_end():
    """reference :21-26: truncate so len(question_tokens) +
    len(subtitle_tokens) <= max_tokens, removing SUBTITLE tokens from the
    end — the budget is joint, not subtitle-only."""
    tok = StubTokenizer()
    question = builder.format_question(ROW["question"], ROW["options"])
    q_len = len(tok(question).input_ids)
    subs = " ".join(f"w{i}" for i in range(50))
    max_tokens = q_len + 10
    out = builder.truncate_subtitles(subs, question, tok, max_tokens)
    assert out == " ".join(f"w{i}" for i in range(10))  # end-cut, not head
    # under budget: untouched
    assert builder.truncate_subtitles(subs, question, tok, q_len + 50) == subs


def test_build_emits_both_variants(tmp_path):
    sub_dir = tmp_path / "subs"
    sub_dir.mkdir()
    (sub_dir / "vid001.srt").write_text(
        "1\n00:00:01,000 --> 00:00:02,000\nHello.\n"
    )
    row2 = dict(ROW, videoID="vid002", video_id="002", question_id="002-1")
    data, data_sub = builder.build(
        [ROW, row2], "frames", subtitle_dir=str(sub_dir),
        tokenizer=StubTokenizer(), max_tokens=100,
    )
    assert len(data) == len(data_sub) == 2
    # plain variant never contains subtitles
    assert "subtitles are listed below" not in data[0]["messages"][0]["content"]
    # row with an srt gets the subtitle question; row without keeps the
    # plain question (reference :78: only wraps when subtitles != "")
    assert data_sub[0]["messages"][0]["content"].startswith(
        "<video>This video's subtitles are listed below:\nHello.\n"
    )
    assert data_sub[1]["messages"][0]["content"] == data[1]["messages"][0]["content"]
    # meta carries the reference keys including question_id
    import json

    meta = json.loads(data[0]["meta"])
    for key in ("video_id", "question_id", "duration", "domain",
                "sub_category", "task_type"):
        assert meta[key] == ROW[key]
    # the subtitle variant must not alias the plain dicts (deep copy)
    data[0]["messages"][0]["content"] = "mutated"
    assert data_sub[0]["messages"][0]["content"] != "mutated"
