"""Prompt rendering must match the reference byte-for-byte
(reference experiments/llava/conversation.py)."""

from llava_align_tpu.conversation import SeparatorStyle, conv_templates


def test_llava_v1_prompt():
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nIs there a dog? Please answer this question with one word.")
    conv.append_message(conv.roles[1], None)
    expected = (
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's questions. "
        "USER: <image>\nIs there a dog? Please answer this question with one word. ASSISTANT:"
    )
    assert conv.get_prompt() == expected
    assert conv.stop_str == "</s>"


def test_llava_v1_full_turn():
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "hi there")
    prompt = conv.get_prompt()
    assert prompt.endswith("USER: hello ASSISTANT: hi there</s>")


def test_single_style():
    conv = conv_templates["llava_v0"].copy()
    conv.append_message(conv.roles[0], "q")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt() == conv.system + "###Human: q###Assistant:"
    assert conv.stop_str == "###"


def test_mpt_style():
    conv = conv_templates["mpt"].copy()
    conv.append_message(conv.roles[0], "q")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.startswith(conv.system + "<|im_end|>")
    assert p.endswith("<|im_start|>user\nq<|im_end|><|im_start|>assistant\n")


def test_plain_style():
    conv = conv_templates["plain"].copy()
    conv.append_message(conv.roles[0], "<image>caption")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt() == "<image>caption\n"


def test_llama2_style():
    conv = conv_templates["llava_llama_2"].copy()
    conv.append_message(conv.roles[0], "question")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    expected = f"[INST] <<SYS>>\n{conv.system}\n<</SYS>>\n\nquestion [/INST]"
    assert p == expected


def test_v0_default_has_fewshot():
    conv = conv_templates["default"].copy()
    assert conv.offset == 2
    assert len(conv.messages) == 2
    assert conv.sep_style == SeparatorStyle.SINGLE


def test_copy_is_deep_for_messages():
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "x")
    conv2 = conv.copy()
    conv2.append_message(conv.roles[1], "y")
    assert len(conv.messages) == 1
    assert len(conv2.messages) == 2


def test_tuple_message_image_rewrite():
    # reference conversation.py:31-40: tuple first message gets "<image>\n"+text
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], ("What is this? <image>", "IMG", "Default"))
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "USER: <image>\nWhat is this? ASSISTANT:" in p
    # original conversation untouched
    assert isinstance(conv.messages[0][1], tuple)


def test_tuple_message_mmtag():
    conv = conv_templates["v1_mmtag"].copy()
    conv.append_message(conv.roles[0], ("Describe <image>", "IMG", "Default"))
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "<Image><image></Image>" in p
    assert "Received." in p
    assert "Describe" in p
