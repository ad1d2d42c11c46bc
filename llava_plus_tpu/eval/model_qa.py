"""Text-only QA runner (ref llava/eval/model_qa.py)."""

import argparse
import json
import os

from llava_plus_tpu.conversation import conv_templates
from llava_plus_tpu.eval.common import EvalSession, short_uuid


def eval_model(args, session=None):
    questions = [json.loads(line) for line in open(
        os.path.expanduser(args.question_file)
    )]
    session = session or EvalSession(
        args.model_path, conv_mode=args.conv_mode, max_new_tokens=1024,
    )
    answers_file = os.path.expanduser(args.answers_file)
    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)
    conv_t = conv_templates[args.conv_mode]
    stop = conv_t.sep2 or conv_t.sep
    with open(answers_file, "w") as f:
        for q in questions:
            idx = q["question_id"]
            text = q["text"]
            conv = conv_t.copy()
            conv.append_message(conv.roles[0], text)
            conv.append_message(conv.roles[1], None)
            output = session.answer(conv.get_prompt(), stop_strings=[stop])
            f.write(json.dumps({
                "question_id": idx,
                "text": output,
                "answer_id": short_uuid(),
                "model_id": args.model_path or "model",
                "metadata": {},
            }) + "\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, default=None)
    parser.add_argument("--question-file", type=str, required=True)
    parser.add_argument("--answers-file", type=str, required=True)
    parser.add_argument("--conv-mode", type=str, default="v1")
    eval_model(parser.parse_args())


if __name__ == "__main__":
    main()
