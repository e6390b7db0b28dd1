"""Build the VideoMME annotation JSON from the official parquet release.

Counterpart of the reference builder (scripts/utils/build_videomme_dataset.py):
each parquet row becomes {messages: [user MC prompt, assistant answer],
videos: [frame_dir], meta: {...}}; the subtitle variant packs the .srt text
into the question, truncated to --max_subtitle_tokens with the model
tokenizer when available.

Usage:
  python scripts/build_videomme_dataset.py --parquet test-00000-of-00001.parquet \
      --frame_root dataset/video_mme/frames --output dataset/video_mme/video_mme.json \
      [--subtitle_dir subs --tokenizer /path/to/ckpt]
"""

from __future__ import annotations

import argparse
import json
import os

import pandas as pd

PROMPT_SUFFIX = "\nAnswer with the option's letter from the given choices directly."


def format_question(row) -> str:
    options = "\n".join(row["options"])
    return f"<video>{row['question']}\n{options}{PROMPT_SUFFIX}"


def load_subtitle(path: str) -> str:
    """Extract plain text from an .srt file."""
    lines = []
    try:
        with open(path, encoding="utf-8", errors="ignore") as f:
            for line in f:
                line = line.strip()
                if not line or line.isdigit() or "-->" in line:
                    continue
                lines.append(line)
    except FileNotFoundError:
        return ""
    return " ".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parquet", required=True)
    p.add_argument("--frame_root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--subtitle_dir", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--max_subtitle_tokens", type=int, default=10000)
    args = p.parse_args()

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    df = pd.read_parquet(args.parquet)
    annos = []
    for _, row in df.iterrows():
        question = format_question(row)
        if args.subtitle_dir:
            sub = load_subtitle(
                os.path.join(args.subtitle_dir, f"{row['videoID']}.srt")
            )
            if sub and tokenizer is not None:
                toks = tokenizer.encode(sub)[: args.max_subtitle_tokens]
                sub = tokenizer.decode(toks)
            if sub:
                question = (
                    f"<video>This video's subtitles are listed below:\n{sub}\n"
                    + question.replace("<video>", "")
                )
        annos.append(
            {
                "messages": [
                    {"role": "user", "content": question},
                    {"role": "assistant", "content": row["answer"]},
                ],
                "videos": [os.path.join(args.frame_root, row["videoID"])],
                "meta": json.dumps(
                    {
                        "video_id": row["video_id"],
                        "duration": row["duration"],
                        "domain": row["domain"],
                        "sub_category": row["sub_category"],
                        "task_type": row["task_type"],
                        "question": row["question"],
                    }
                ),
            }
        )
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(annos, f, indent=1)
    print(f"wrote {len(annos)} annotations -> {args.output}")


if __name__ == "__main__":
    main()
