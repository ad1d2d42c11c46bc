"""MM-Vet answers -> evaluator JSON (ref scripts/convert_mmvet_for_eval.py)."""

import argparse
import json

parser = argparse.ArgumentParser()
parser.add_argument("--src", type=str, required=True)
parser.add_argument("--dst", type=str, required=True)
args = parser.parse_args()

cur_result = {}
for line in open(args.src):
    data = json.loads(line)
    qid = data["question_id"]
    cur_result[f"v1_{qid}"] = data["text"]

with open(args.dst, "w") as f:
    json.dump(cur_result, f, indent=2)
