"""Build the LVBench annotation JSON from video_info.meta.jsonl.

Counterpart of scripts/utils/build_lvbench_dataset.py: every qa entry of every
video becomes one annotation; the (multi-label) question_type list is stored
in meta for the per-type scorer.

Usage:
  python scripts/build_lvbench_dataset.py --meta video_info.meta.jsonl \
      --frame_root frames --output dataset/lvbench/lvbench.json
"""

from __future__ import annotations

import argparse
import json
import os

PROMPT_SUFFIX = "\nAnswer with the option's letter from the given choices directly."


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta", required=True)
    p.add_argument("--frame_root", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    annos = []
    with open(args.meta) as f:
        for line in f:
            info = json.loads(line)
            key = info["key"]
            for qa in info["qa"]:
                # qa question already contains lettered options
                content = f"<video>{qa['question']}{PROMPT_SUFFIX}"
                annos.append(
                    {
                        "messages": [
                            {"role": "user", "content": content},
                            {"role": "assistant", "content": qa["answer"]},
                        ],
                        "videos": [os.path.join(args.frame_root, key)],
                        "meta": json.dumps(
                            {
                                "video_id": key,
                                "question_type": qa["question_type"],
                                "time_reference": qa.get("time_reference"),
                                "question": qa["question"],
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
