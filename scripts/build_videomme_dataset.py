"""Build the VideoMME annotation JSONs from the official parquet release.

Counterpart of the reference builder (scripts/utils/build_videomme_dataset.py):
each parquet row becomes {messages: [user MC prompt, assistant answer],
videos: [frame_dir], meta: {...}}. One run emits BOTH variants, exactly like
the reference: ``video_mme.json`` (plain) and ``video_mme_subtitle.json``
(the .srt text packed into the question).

Prompt parity is byte-exact vs the reference (tests/test_data.py):
  * question format ``<video>%s\nOptions:\n%s\nAnswer with the option's
    letter from the given choices directly.`` (reference :48-51) — including
    the ``Options:`` line;
  * subtitles joined with "\n" across cues, in-cue line breaks flattened to
    " " (reference :11-19, pysubs2 ``\\N`` semantics);
  * the subtitle budget is JOINT over question+subtitles: tokens are cut
    from the END of the subtitles until len(question_tokens) +
    len(subtitle_tokens) <= max_tokens (reference :21-26) — NOT a fixed
    subtitle-only budget.

Usage:
  python scripts/build_videomme_dataset.py \
      --parquet test-00000-of-00001.parquet \
      --frame_root dataset/video_mme/frames \
      --output_dir dataset/video_mme \
      [--subtitle_dir subs --tokenizer /path/to/ckpt --max_tokens 10000]
"""

from __future__ import annotations

import argparse
import json
import os

PROMPT_SUFFIX = "\nAnswer with the option's letter from the given choices directly."


def format_question(question: str, options) -> str:
    """Reference build_videomme_dataset.py:48-51, byte-exact."""
    return f"<video>{question}\nOptions:\n" + "\n".join(options) + PROMPT_SUFFIX


def format_subtitle_question(question: str, options, subtitles: str) -> str:
    """Reference build_videomme_dataset.py:79-81, byte-exact."""
    return (
        "<video>This video's subtitles are listed below:\n"
        f"{subtitles}\n{question}\nOptions:\n" + "\n".join(options)
        + PROMPT_SUFFIX
    )


def load_subtitle(path: str) -> str:
    """Plain-srt parse matching the reference's pysubs2 usage (:11-19):
    cue text lines join with " " (pysubs2 renders in-cue newlines as
    ``\\N``, which the reference replaces with a space), cues join with
    "\n", cues empty after strip are skipped."""
    try:
        with open(path, encoding="utf-8", errors="ignore") as f:
            raw = f.read()
    except FileNotFoundError:
        return ""
    cues = []
    for block in raw.replace("\r\n", "\n").split("\n\n"):
        lines = [ln for ln in block.split("\n") if ln.strip()]
        # drop the index line and the timing line
        if lines and lines[0].strip().isdigit():
            lines = lines[1:]
        if lines and "-->" in lines[0]:
            lines = lines[1:]
        text = " ".join(lines)
        if text.strip():
            cues.append(text)
    return "\n".join(cues)


def truncate_subtitles(
    subtitles: str, question: str, tokenizer, max_tokens: int
) -> str:
    """Joint question+subtitle token budget, cutting subtitle tokens from
    the END (reference build_videomme_dataset.py:21-26)."""
    q_tok = tokenizer(question).input_ids
    s_tok = tokenizer(subtitles).input_ids
    if len(q_tok) + len(s_tok) > max_tokens:
        cutoff = len(q_tok) + len(s_tok) - max_tokens
        s_tok = s_tok[:-cutoff]
        subtitles = tokenizer.decode(s_tok, skip_special_tokens=True)
    return subtitles


def build(rows, frame_root: str, subtitle_dir=None, tokenizer=None,
          max_tokens: int = 10000):
    """rows: iterable of dict-like parquet rows -> (plain, subtitle) lists.

    Separated from the CLI so the parity test can drive it on a synthetic
    fixture without parquet IO.
    """
    data, data_sub = [], []
    for row in rows:
        question = format_question(row["question"], row["options"])
        d = {
            "messages": [
                {"content": question, "role": "user"},
                {"content": row["answer"], "role": "assistant"},
            ],
            "videos": [os.path.join(frame_root, row["videoID"])],
            "meta": json.dumps(
                {
                    "video_id": row["video_id"],
                    "question_id": row["question_id"],
                    "duration": row["duration"],
                    "domain": row["domain"],
                    "sub_category": row["sub_category"],
                    "task_type": row["task_type"],
                    # extra key vs the reference: our scorers key per-sample
                    # output rows on the raw question text
                    "question": row["question"],
                }
            ),
        }
        data.append(d)

        subtitles = ""
        if subtitle_dir:
            subtitles = load_subtitle(
                os.path.join(subtitle_dir, f"{row['videoID']}.srt")
            )
            if subtitles and tokenizer is not None:
                subtitles = truncate_subtitles(
                    subtitles, question, tokenizer, max_tokens
                )
        d_sub = json.loads(json.dumps(d))  # deep copy
        if subtitles != "":
            d_sub["messages"][0]["content"] = format_subtitle_question(
                row["question"], row["options"], subtitles
            )
        data_sub.append(d_sub)
    return data, data_sub


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parquet", required=True)
    p.add_argument("--frame_root", required=True)
    p.add_argument("--output_dir", required=True,
                   help="emits video_mme.json AND video_mme_subtitle.json")
    p.add_argument("--subtitle_dir", default=None)
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer path for the joint subtitle budget; "
                        "without it subtitles are packed untruncated")
    p.add_argument("--max_tokens", type=int, default=10000)
    args = p.parse_args()

    import pandas as pd

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    df = pd.read_parquet(args.parquet)
    data, data_sub = build(
        (row for _, row in df.iterrows()), args.frame_root,
        subtitle_dir=args.subtitle_dir, tokenizer=tokenizer,
        max_tokens=args.max_tokens,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    plain = os.path.join(args.output_dir, "video_mme.json")
    sub = os.path.join(args.output_dir, "video_mme_subtitle.json")
    with open(plain, "w") as f:
        json.dump(data, f, indent=1)
    with open(sub, "w") as f:
        json.dump(data_sub, f, indent=1)
    print(f"wrote {len(data)} annotations -> {plain} + {sub}")


if __name__ == "__main__":
    main()
