"""Build the MLVU (dev) annotation JSON from the official task JSONs.

Counterpart of scripts/utils/build_mlvu_dataset.py in the reference: the nine
dev tasks map to question types; multiple-choice tasks become A-D letter
prompts, generation tasks (Video Summary / Sub-Scene Captioning) keep free
text plus scoring_points metadata for the GPT judge.

Usage:
  python scripts/build_mlvu_dataset.py --mlvu_root MLVU --frame_root frames \
      --output dataset/mlvu/mlvu.json
"""

from __future__ import annotations

import argparse
import json
import os
import string

PROMPT_SUFFIX = "\nAnswer with the option's letter from the given choices directly."

# task file stem -> human-readable question type (reference mapping)
TASK_TYPES = {
    "1_plotQA": ("Plot QA", "mc"),
    "2_needle": ("Needle QA", "mc"),
    "3_ego": ("Ego Reasoning", "mc"),
    "4_count": ("Action Count", "mc"),
    "5_order": ("Action Order", "mc"),
    "6_anomaly_reco": ("Anomaly Recognition", "mc"),
    "7_topic_reasoning": ("Topic Reasoning", "mc"),
    "8_sub_scene": ("Sub-Scene Captioning", "gen"),
    "9_summary": ("Video Summary", "gen"),
}

# test split adds SportsQA and Tutorial QA (reference
# build_mlvu_test_dataset.py variant)
TEST_TASK_TYPES = dict(
    TASK_TYPES,
    **{
        "10_sports": ("SportsQA", "mc"),
        "11_tutorial": ("Tutorial QA", "mc"),
    },
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mlvu_root", required=True, help="dir with json/ and video/")
    p.add_argument("--frame_root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--split", choices=["dev", "test"], default="dev")
    args = p.parse_args()

    task_types = TASK_TYPES if args.split == "dev" else TEST_TASK_TYPES
    annos = []
    json_dir = os.path.join(args.mlvu_root, "json")
    for stem, (qtype, kind) in task_types.items():
        path = os.path.join(json_dir, f"{stem}.json")
        if not os.path.exists(path):
            print("missing task file:", path)
            continue
        with open(path) as f:
            items = json.load(f)
        for item in items:
            video_stem = os.path.splitext(os.path.basename(item["video"]))[0]
            frame_dir = os.path.join(args.frame_root, stem, video_stem)
            meta = {"question_type": qtype, "question": item["question"]}
            if kind == "mc":
                letters = string.ascii_uppercase
                opts = item["candidates"]
                options = "\n".join(
                    f"{letters[i]}. {o}" for i, o in enumerate(opts)
                )
                answer = letters[opts.index(item["answer"])]
                content = (
                    f"<video>{item['question']}\n{options}{PROMPT_SUFFIX}"
                )
            else:
                content = f"<video>{item['question']}"
                answer = item["answer"]
                meta["original_answer"] = item["answer"]
                if "scoring_points" in item:
                    meta["scoring_points"] = item["scoring_points"]
            annos.append(
                {
                    "messages": [
                        {"role": "user", "content": content},
                        {"role": "assistant", "content": answer},
                    ],
                    "videos": [frame_dir],
                    "meta": json.dumps(meta),
                }
            )
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(annos, f, indent=1)
    print(f"wrote {len(annos)} annotations -> {args.output}")


if __name__ == "__main__":
    main()
