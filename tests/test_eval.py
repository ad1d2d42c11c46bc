"""Eval harness tests: chunking, runner contract with a fake backend,
POPE/TextVQA scorer behavior."""

import json
import os
import types

import numpy as np
import pytest
from PIL import Image

from llava_plus_tpu.eval.common import get_chunk, split_list
from llava_plus_tpu.eval.eval_pope import eval_pope
from llava_plus_tpu.eval.m4c_evaluator import (
    EvalAIAnswerProcessor,
    STVQAAccuracyEvaluator,
    TextVQAAccuracyEvaluator,
)


def test_chunking():
    lst = list(range(10))
    chunks = split_list(lst, 3)
    assert sum(chunks, []) == lst
    assert get_chunk(lst, 3, 0) == [0, 1, 2, 3]
    assert get_chunk(lst, 1, 0) == lst


def test_evalai_processor_normalization():
    p = EvalAIAnswerProcessor()
    assert p("A Dog!") == "dog"
    assert p("  two ") == "2"
    assert p("isnt") == "isn't"
    assert p("the answer") == "answer"
    assert p("1,000") == "1000"


def test_textvqa_soft_accuracy():
    ev = TextVQAAccuracyEvaluator()
    # 10 humans: 5 say "cat", 5 say "dog"
    gt = ["cat"] * 5 + ["dog"] * 5
    acc_cat = ev.eval_pred_list([{"pred_answer": "cat", "gt_answers": gt}])
    # for answer "cat": each of 10 leave-one-out subsets has 4 or 5 matches
    # -> min(1, m/3) = 1 everywhere
    assert acc_cat == 1.0
    gt2 = ["cat"] * 1 + ["dog"] * 9
    acc = ev.eval_pred_list([{"pred_answer": "cat", "gt_answers": gt2}])
    assert 0.0 < acc < 0.5
    miss = ev.eval_pred_list([{"pred_answer": "fish", "gt_answers": gt2}])
    assert miss == 0.0


def test_stvqa_exact_match():
    ev = STVQAAccuracyEvaluator()
    acc = ev.eval_pred_list([
        {"pred_answer": "A Dog", "gt_answers": ["dog", "puppy"]},
        {"pred_answer": "cat", "gt_answers": ["dog"]},
    ])
    assert acc == 0.5


def test_pope_scoring(tmp_path):
    labels = [{"label": "yes"}, {"label": "no"}, {"label": "yes"},
              {"label": "no"}]
    label_file = tmp_path / "labels.jsonl"
    label_file.write_text("\n".join(json.dumps(l) for l in labels))
    answers = [
        {"text": "Yes, it is."},
        {"text": "No."},
        {"text": "Yes there is a dog."},
        {"text": "Yes."},  # wrong
    ]
    stats = eval_pope([dict(a) for a in answers], str(label_file))
    assert stats["accuracy"] == 0.75
    assert stats["recall"] == 1.0
    assert stats["precision"] == pytest.approx(2 / 3)


def test_model_vqa_loader_with_fake_backend(tmp_path):
    from llava_plus_tpu.eval import model_vqa_loader
    from llava_plus_tpu.eval.common import EvalSession

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    questions = []
    for i in range(3):
        Image.new("RGB", (32, 32), (i * 40, 0, 0)).save(img_dir / f"{i}.jpg")
        questions.append({
            "question_id": i, "image": f"{i}.jpg",
            "text": f"What is in image {i}?",
        })
    qfile = tmp_path / "questions.jsonl"
    qfile.write_text("\n".join(json.dumps(q) for q in questions))

    class FakeBackend:
        def answer(self, prompt, image):
            assert "ASSISTANT:" in prompt
            return "a red square"

    session = EvalSession(None, backend=FakeBackend())
    args = types.SimpleNamespace(
        model_path="fake/llava-test", model_base=None,
        image_folder=str(img_dir), question_file=str(qfile),
        answers_file=str(tmp_path / "answers.jsonl"),
        conv_mode="llava_v1", num_chunks=1, chunk_idx=0,
        temperature=0.0, top_p=1.0, max_new_tokens=16,
    )
    model_vqa_loader.eval_model(args, session=session)
    rows = [json.loads(l) for l in open(tmp_path / "answers.jsonl")]
    assert len(rows) == 3
    assert all(r["text"] == "a red square" for r in rows)
    assert rows[0]["model_id"] == "llava-test"
    assert {r["question_id"] for r in rows} == {0, 1, 2}


def test_model_vqa_loader_chunked(tmp_path):
    from llava_plus_tpu.eval import model_vqa_loader
    from llava_plus_tpu.eval.common import EvalSession

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    questions = []
    for i in range(5):
        Image.new("RGB", (16, 16)).save(img_dir / f"{i}.jpg")
        questions.append({
            "question_id": i, "image": f"{i}.jpg", "text": "q",
        })
    qfile = tmp_path / "q.jsonl"
    qfile.write_text("\n".join(json.dumps(q) for q in questions))

    class FakeBackend:
        def answer(self, prompt, image):
            return "ans"

    all_ids = set()
    for k in range(2):
        args = types.SimpleNamespace(
            model_path="m", model_base=None, image_folder=str(img_dir),
            question_file=str(qfile),
            answers_file=str(tmp_path / f"a{k}.jsonl"),
            conv_mode="llava_v1", num_chunks=2, chunk_idx=k,
            temperature=0.0, top_p=1.0, max_new_tokens=4,
        )
        model_vqa_loader.eval_model(
            args, session=EvalSession(None, backend=FakeBackend())
        )
        all_ids |= {
            json.loads(l)["question_id"] for l in open(tmp_path / f"a{k}.jsonl")
        }
    assert all_ids == {0, 1, 2, 3, 4}


def test_gpt_review_visual_offline_stub(tmp_path, monkeypatch):
    """The visual judge pipeline runs end-to-end offline against the
    shipped benchmark fixtures (caps/boxes context + qa90 questions),
    with LLAVA_GPT_REVIEW_STUB providing a deterministic review (ref
    llava/eval/eval_gpt_review_visual.py consumed via --context)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    q = os.path.join(
        repo, "playground/data/coco2014_val_qa_eval/qa90_questions.jsonl"
    )
    ans = os.path.join(
        repo, "playground/data/coco2014_val_qa_eval/qa90_gpt4_answer.jsonl"
    )
    ctx = os.path.join(
        repo, "llava_plus_tpu/eval/table/caps_boxes_coco2014_val_80.jsonl"
    )
    rule = os.path.join(repo, "llava_plus_tpu/eval/table/rule.json")
    out = tmp_path / "review.jsonl"
    env = dict(os.environ, LLAVA_GPT_REVIEW_STUB="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "llava_plus_tpu.eval.eval_gpt_review_visual",
         "-q", q, "-c", ctx, "-a", ans, ans, "-r", rule,
         "-o", str(out)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 90
    assert all(row["tuple"] == [5.0, 4.0] for row in rows)
    s = subprocess.run(
        [sys.executable, "-m", "llava_plus_tpu.eval.summarize_gpt_review",
         "-d", str(tmp_path), "-f", "review.jsonl"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=60,
    )
    assert s.returncode == 0, s.stderr
    assert "all" in s.stdout


def test_answer_many_engine_mode_matches_single_stream():
    """EvalSession(engine=...): answers come back IN ORDER and equal the
    single-stream generator's greedy output for every prompt."""
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.eval.common import EvalSession
    from llava_plus_tpu.generate import Generator
    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import tiny_llava_config
    from llava_plus_tpu.serve.engine import BatchedEngine

    from .test_generate import CharTokenizer

    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    tok = CharTokenizer()
    engine = BatchedEngine(
        params, cfg, tok, max_slots=2, max_seq_len=96,
        prefill_bucket=32, cache_dtype=jnp.float32,
    )
    gen = Generator(
        params, cfg, tok, max_seq_len=96, prefill_bucket=32,
        cache_dtype=jnp.float32, attn_impl="xla",
    )
    try:
        session = EvalSession(None, engine=engine, max_new_tokens=5)
        prompts = ["hello", "xyz", "abab", "qq", "zz"]  # > 2x slots window
        refs = [gen.generate(p, max_new_tokens=5, temperature=0.0)
                .text.strip() for p in prompts]
        got = list(session.answer_many((p, None) for p in prompts))
        assert got == refs
    finally:
        engine.stop()


def test_answer_many_serial_fallback_order():
    from llava_plus_tpu.eval.common import EvalSession

    class FakeBackend:
        def answer(self, prompt, image):
            return f"ans:{prompt}"

    session = EvalSession(None, backend=FakeBackend())
    got = list(session.answer_many((f"p{i}", None) for i in range(4)))
    assert got == [f"ans:p{i}" for i in range(4)]


def test_model_vqa_science_fake_backend(tmp_path):
    """Science runner after the answer_many refactor: ordering, image /
    no-image mixing, single-pred-prompt suffix, cur_prompt bookkeeping."""
    from llava_plus_tpu.eval import model_vqa_science
    from llava_plus_tpu.eval.common import EvalSession

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (20, 20), (9, 9, 9)).save(img_dir / "s0.jpg")
    questions = [
        {"id": "q0", "image": "s0.jpg", "conversations": [
            {"from": "human", "value": "<image>\nWhich color?"}]},
        {"id": "q1", "conversations": [
            {"from": "human", "value": "What is 2+2?"}]},
    ]
    qfile = tmp_path / "sqa.json"
    qfile.write_text(json.dumps(questions))

    class FakeBackend:
        def answer(self, prompt, image):
            assert "letter from the given choices" in prompt
            return "A" if image is not None else "B"

    args = types.SimpleNamespace(
        model_path="m", model_base=None, image_folder=str(img_dir),
        question_file=str(qfile),
        answers_file=str(tmp_path / "sqa_ans.jsonl"),
        conv_mode="llava_v1", num_chunks=1, chunk_idx=0,
        temperature=0.0, single_pred_prompt=True,
    )
    model_vqa_science.eval_model(
        args, session=EvalSession(None, backend=FakeBackend())
    )
    rows = [json.loads(l) for l in open(tmp_path / "sqa_ans.jsonl")]
    assert [r["question_id"] for r in rows] == ["q0", "q1"]
    assert [r["text"] for r in rows] == ["A", "B"]
    assert rows[0]["prompt"].startswith("<image>\nWhich color?")
    assert rows[1]["prompt"].startswith("What is 2+2?")


def test_model_vqa_mmbench_all_rounds(tmp_path):
    """MMBench runner: circular option rotation per round, TSV+base64
    input, batched answer path keeps (question, round) output order."""
    import base64
    import io

    import pandas as pd

    from llava_plus_tpu.eval import model_vqa_mmbench
    from llava_plus_tpu.eval.common import EvalSession

    buf = io.BytesIO()
    Image.new("RGB", (24, 24), (1, 2, 3)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    rows = [
        {"index": 7, "question": "Which animal?", "hint": "A pet.",
         "image": b64, "A": "cat", "B": "dog", "C": "fox", "D": None},
        {"index": 8, "question": "Which number?", "hint": float("nan"),
         "image": b64, "A": "one", "B": "two", "C": None, "D": None},
    ]
    qfile = tmp_path / "mmb.tsv"
    pd.DataFrame(rows).to_csv(qfile, sep="\t", index=False)

    class FakeBackend:
        def answer(self, prompt, image):
            return "A"

    args = types.SimpleNamespace(
        model_path="m", model_base=None, question_file=str(qfile),
        answers_file=str(tmp_path / "mmb_ans.jsonl"),
        conv_mode="llava_v1", num_chunks=1, chunk_idx=0,
        temperature=0.0, all_rounds=True, single_pred_prompt=True,
        lang="en",
    )
    model_vqa_mmbench.eval_model(
        args, session=EvalSession(None, backend=FakeBackend())
    )
    out = [json.loads(l) for l in open(tmp_path / "mmb_ans.jsonl")]
    # 3 options -> 3 rounds for q7; 2 options -> 2 rounds for q8
    assert [(r["question_id"], r["round_id"]) for r in out] == [
        (7, 0), (7, 1), (7, 2), (8, 0), (8, 1),
    ]
    # option rotation: round 1 of q7 leads with "dog"
    assert out[0]["options"] == ["cat", "dog", "fox"]
    assert out[1]["options"] == ["dog", "fox", "cat"]
    assert out[1]["option_char"] == ["B", "C", "A"]
    # hint folded into the prompt (q7), skipped when NaN (q8)
    assert out[0]["prompt"].startswith("A pet.\nWhich animal?")
    assert out[3]["prompt"].startswith("Which number?")
    assert all(r["text"] == "A" for r in out)


def test_model_vqa_science_answer_prompter(tmp_path):
    """--answer-prompter: second batched pass requeries with
    prompt + reasoning + ' ###\\nANSWER:' and the final text is
    reasoning + '\\n The answer is ' + answer (ref science runner)."""
    from llava_plus_tpu.eval import model_vqa_science
    from llava_plus_tpu.eval.common import EvalSession

    questions = [
        {"id": "q0", "conversations": [
            {"from": "human", "value": "Why is the sky blue?"}]},
    ]
    qfile = tmp_path / "sqa2.json"
    qfile.write_text(json.dumps(questions))

    class FakeBackend:
        def answer(self, prompt, image):
            if "###\nANSWER:" in prompt:
                assert "because scattering" in prompt  # reasoning included
                return "B"
            return "because scattering"

    args = types.SimpleNamespace(
        model_path="m", model_base=None, image_folder="",
        question_file=str(qfile),
        answers_file=str(tmp_path / "sqa2_ans.jsonl"),
        conv_mode="llava_v1", num_chunks=1, chunk_idx=0,
        temperature=0.0, single_pred_prompt=False, answer_prompter=True,
    )
    model_vqa_science.eval_model(
        args, session=EvalSession(None, backend=FakeBackend())
    )
    rows = [json.loads(l) for l in open(tmp_path / "sqa2_ans.jsonl")]
    assert rows[0]["text"] == "because scattering\n The answer is B"
