"""Conversation template parity tests.

Each template's rendered prompt is compared byte-for-byte against the
reference implementation (loaded standalone) and, for the core templates,
against hard-coded goldens so the tests still bite without /root/reference.
"""

import pytest

from llava_plus_tpu import conversation as conv_mod
from llava_plus_tpu.conversation import (
    SeparatorStyle,
    conv_templates,
    parse_actions,
    parse_tool_output,
    serialize_tool_turn,
)

from .reference_loader import load_reference_module, reference_available


def _chat(conv, turns):
    c = conv.copy()
    for i, msg in enumerate(turns):
        c.append_message(c.roles[i % 2], msg)
    return c


TURN_SETS = [
    ["Hello there", "Hi! How can I help?", "Describe <image>\nplease.", None],
    ["<image>\nWhat is shown?", "A cat on a mat.", "Are you sure?", "Yes."],
    ["Just text", None],
]


def test_template_registry_complete():
    expected = {
        "default", "v0", "v1", "vicuna_v1", "llama_2", "plain", "v0_plain",
        "llava_v0", "v0_mmtag", "llava_v1", "v1_mmtag", "llava_llama_2", "mpt",
    }
    assert set(conv_templates) == expected


def test_vicuna_v1_golden():
    c = _chat(conv_templates["v1"], ["What is 2+2?", "4", "And 3+3?", None])
    sys = (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    )
    assert c.get_prompt() == (
        sys + " USER: What is 2+2? ASSISTANT: 4</s>USER: And 3+3? ASSISTANT:"
    )


def test_mpt_golden():
    c = _chat(conv_templates["mpt"], ["hi", None])
    assert c.get_prompt() == (
        "<|im_start|>system\n"
        "A conversation between a user and an LLM-based AI assistant. "
        "The assistant gives helpful and honest answers.<|im_end|>"
        "<|im_start|>user\nhi<|im_end|><|im_start|>assistant\n"
    )


def test_plain_golden():
    # PLAIN renders bare messages joined by sep/sep2; the training path sets
    # sep2 before rendering pairs (ref train.py preprocess_plain), so only the
    # even-turn rendering is exercised with the registered template.
    c = conv_templates["plain"].copy()
    c.append_message(c.roles[0], "<image>\n")
    assert c.get_prompt() == "<image>\n\n"


def test_llama2_golden():
    c = _chat(conv_templates["llava_llama_2"], ["hello", "hi there", "more?", None])
    sys = conv_templates["llava_llama_2"].system
    expected = (
        f"[INST] <<SYS>>\n{sys}\n<</SYS>>\n\nhello [/INST] hi there </s>"
        f"<s>[INST] more? [/INST]"
    )
    assert c.get_prompt() == expected


def test_image_tuple_first_message_rewrite():
    c = conv_templates["v1"].copy()
    c.append_message(c.roles[0], ("What?\n<image>", "fake_img", "Default"))
    c.append_message(c.roles[1], None)
    p = c.get_prompt()
    assert "<image>\nWhat?" in p
    assert p.count("<image>") == 1


def test_mmtag_rewrite():
    c = conv_templates["v1_mmtag"].copy()
    c.append_message(c.roles[0], ("What?\n<image>", "fake_img", "Default"))
    c.append_message(c.roles[1], None)
    p = c.get_prompt()
    assert "<Image><image></Image>" in p
    assert "Received." in p


def test_tool_grammar_roundtrip():
    text = serialize_tool_turn(
        thoughts="I should ground the object.",
        actions=[{"API_name": "grounding_dino", "API_params": {"caption": "a cat"}}],
        value="Working on it.",
    )
    m = parse_tool_output(text)
    assert m is not None
    thoughts, actions, value = m[0]
    assert thoughts.strip() == "I should ground the object."
    parsed = parse_actions(actions)
    assert parsed[0]["API_name"] == "grounding_dino"
    assert value.strip() == "Working on it."


def test_tool_grammar_rejects_malformed():
    assert parse_tool_output("no grammar here") is None
    assert parse_tool_output('"thoughts🤔" only thoughts') is None


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("name", sorted(conv_templates))
@pytest.mark.parametrize("turns_idx", range(len(TURN_SETS)))
def test_parity_with_reference(name, turns_idx):
    ref = load_reference_module("llava/conversation.py", "ref_conversation")
    turns = TURN_SETS[turns_idx]
    ours = conv_templates[name]
    theirs = ref.conv_templates[name]
    if ours.sep_style == SeparatorStyle.LLAMA_2 and not turns[0]:
        pytest.skip("llama2 requires non-empty first message")
    if ours.sep_style == SeparatorStyle.PLAIN and any(
        m for i, m in enumerate(turns) if i % 2
    ):
        pytest.skip("registered plain template has sep2=None; odd turns unused")
    c_ours = _chat(ours, turns)
    c_theirs = theirs.copy()
    for i, m in enumerate(turns):
        c_theirs.append_message(c_theirs.roles[i % 2], m)
    assert c_ours.get_prompt() == c_theirs.get_prompt()


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parse_tool_output_parity():
    ref = load_reference_module("llava/conversation.py", "ref_conversation")
    samples = [
        serialize_tool_turn("t", [{"a": 1}], "v"),
        "garbage",
        '"thoughts🤔" x "actions🚀" [] "value👉" done',
        '"thoughts🤔" a "actions🚀" [] "value👉" b "thoughts🤔" c "actions🚀" [] "value👉" d',
    ]
    for s in samples:
        ours = parse_tool_output(s)
        theirs = ref.parse_tool_output(s)
        assert (ours is None) == (theirs is None)
        if ours is not None:
            # reference returns a single match too; the grammar is greedy so a
            # doubled block still yields one match in both.
            assert list(ours[0]) == list(theirs[0])
