"""Composed LLaVA pipeline parity vs the REFERENCE torch splicer.

Oracle: the reference's own `prepare_inputs_labels_for_multimodal`
(/root/reference/experiments/llava/model/llava_arch.py:87-204) composed with
its CLIPVisionTower (multimodal_encoder/clip_encoder.py:39-51), its
build_vision_projector (multimodal_projector/builder.py:33-51) and an HF
LlamaForCausalLM — the exact class sandwich of llava_llama.py:32-57 — loaded
read-only at a tiny config. Each stage already has its own parity test
(test_clip_parity / test_llama_parity / test_splice); this file pins the
COMPOSED end-to-end logits, including:

* the full splice loop (llava_arch.py:108-166) on single- and multi-image
  sequences,
* the ragged multi-image batch alignment path (:168-193),
* the text-only-sample-in-multimodal-batch branch (:109-121),
* the decode-step shortcut with a populated KV cache (:91-94), greedy
  multi-token.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stub_utils import stub_module

from llava_align_tpu.config import ClipVisionConfig, LlamaConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.models import llava
from llava_align_tpu.utils.hf_convert import (
    convert_clip,
    convert_llama,
    convert_projector,
)

REF_MODEL_DIR = "/root/reference/experiments/llava/model"

TEXT_CFG = LlamaConfig.tiny(vocab_size=128)
VISION_CFG = ClipVisionConfig.tiny()  # 28/14 → 4 patches/image
CFG = LlavaConfig(
    text=TEXT_CFG,
    vision=VISION_CFG,
    mm_projector_type="mlp2x_gelu",
    image_aspect_ratio=None,
)
N_IMG = CFG.num_image_tokens  # 4


def _load_ref_arch():
    """Import the reference llava_arch.py read-only, without its parent
    llava package (its __init__ pulls the whole model zoo incl. triton)."""
    if "refllavamodel" not in sys.modules:
        # absolute `from llava.constants import ...` (llava_arch.py:24)
        stub_module("llava")
        stub_module(
            "llava.constants",
            IGNORE_INDEX=-100,
            IMAGE_TOKEN_INDEX=IMAGE_TOKEN_INDEX,
            DEFAULT_IMAGE_PATCH_TOKEN="<im_patch>",
            DEFAULT_IM_START_TOKEN="<im_start>",
            DEFAULT_IM_END_TOKEN="<im_end>",
        )
        pkg = types.ModuleType("refllavamodel")
        pkg.__path__ = [REF_MODEL_DIR]
        sys.modules["refllavamodel"] = pkg
    return importlib.import_module("refllavamodel.llava_arch")


@pytest.fixture(scope="module")
def oracle_and_params(tmp_path_factory):
    from transformers import (
        CLIPImageProcessor,
        CLIPVisionConfig as HFClipCfg,
        CLIPVisionModel,
        LlamaConfig as HFLlamaConfig,
        LlamaForCausalLM,
        LlamaModel,
    )

    ref_arch = _load_ref_arch()

    # tiny CLIP saved to disk so the reference tower loads it by path
    # (builder.py accepts any existing absolute path)
    torch.manual_seed(0)
    clip = CLIPVisionModel(
        HFClipCfg(
            image_size=VISION_CFG.image_size,
            patch_size=VISION_CFG.patch_size,
            hidden_size=VISION_CFG.hidden_size,
            intermediate_size=VISION_CFG.intermediate_size,
            num_hidden_layers=VISION_CFG.num_layers,
            num_attention_heads=VISION_CFG.num_heads,
            hidden_act="quick_gelu",
            attn_implementation="eager",
        )
    ).eval()
    clip_dir = tmp_path_factory.mktemp("tiny_clip")
    clip.save_pretrained(clip_dir)
    CLIPImageProcessor(size=VISION_CFG.image_size).save_pretrained(clip_dir)

    hf_cfg = HFLlamaConfig(
        vocab_size=TEXT_CFG.vocab_size,
        hidden_size=TEXT_CFG.hidden_size,
        intermediate_size=TEXT_CFG.intermediate_size,
        num_hidden_layers=TEXT_CFG.num_layers,
        num_attention_heads=TEXT_CFG.num_heads,
        num_key_value_heads=TEXT_CFG.num_kv_heads,
        max_position_embeddings=TEXT_CFG.max_position_embeddings,
        rms_norm_eps=TEXT_CFG.rms_norm_eps,
        rope_theta=TEXT_CFG.rope_theta,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    # multimodal attrs the reference mixin reads (llava_llama.py configs
    # carry these on the LlamaConfig)
    hf_cfg.mm_vision_tower = str(clip_dir)
    hf_cfg.mm_projector_type = CFG.mm_projector_type
    hf_cfg.mm_hidden_size = VISION_CFG.hidden_size
    hf_cfg.mm_vision_select_layer = VISION_CFG.select_layer
    hf_cfg.mm_vision_select_feature = VISION_CFG.select_feature

    # the exact class sandwich of the reference llava_llama.py:32-57
    class OracleModel(ref_arch.LlavaMetaModel, LlamaModel):
        config_class = HFLlamaConfig

    class OracleForCausalLM(LlamaForCausalLM, ref_arch.LlavaMetaForCausalLM):
        def __init__(self, config):
            super().__init__(config)
            self.model = OracleModel(config)
            self.post_init()

        def get_model(self):
            return self.model

    torch.manual_seed(1)
    oracle = OracleForCausalLM(hf_cfg).eval()
    oracle.get_vision_tower().load_model()  # reference builder.py:137-141

    sd = {k: v.detach() for k, v in oracle.state_dict().items()}
    params = {
        "llama": convert_llama(sd, TEXT_CFG),
        "vision": convert_clip(
            {k: v for k, v in clip.state_dict().items()}, VISION_CFG
        ),
        "projector": convert_projector(
            sd, CFG.mm_projector_type, TEXT_CFG.dtype, prefix="model.mm_projector."
        ),
    }
    return oracle, params


def _oracle_prefill(oracle, ids_rows, images, labels=None):
    """Run the reference splice + LlamaModel + lm_head on a rectangular
    batch. Returns (logits [B, S, V] numpy, attention_mask, past_key_values,
    spliced_embeds)."""
    input_ids = torch.tensor(ids_rows, dtype=torch.long)
    attention_mask = torch.ones_like(input_ids, dtype=torch.bool)
    with torch.no_grad():
        (_ids, attn, pkv, embeds, _labels) = (
            oracle.prepare_inputs_labels_for_multimodal(
                input_ids, attention_mask, None, labels, images
            )
        )
        out = oracle.model(
            inputs_embeds=embeds, attention_mask=attn, use_cache=True
        )
        logits = oracle.lm_head(out.last_hidden_state)
    return logits.numpy(), attn, out.past_key_values, embeds


def _mine_prefill(params, ids, images, pad_to):
    logits, length = llava.forward_multimodal(
        params, CFG, ids, images, pad_to, attn_impl="xla"
    )
    return np.asarray(logits), length


def test_single_image_prefill_composed_logits(oracle_and_params):
    oracle, params = oracle_and_params
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids = [1, 5, IMAGE_TOKEN_INDEX, 7, 9, 23, 11]
    spliced_len = len(ids) - 1 + N_IMG

    theirs, _, _, _ = _oracle_prefill(
        oracle, [ids], torch.tensor(pixels)
    )
    ours, length = _mine_prefill(params, ids, jnp.asarray(pixels), spliced_len)
    assert length == spliced_len == theirs.shape[1]
    np.testing.assert_allclose(ours, theirs[0], atol=1e-3, rtol=1e-4)

    # padding-invariance: a longer static bucket must not change the valid rows
    ours_padded, _ = _mine_prefill(params, ids, jnp.asarray(pixels), spliced_len + 13)
    np.testing.assert_allclose(
        ours_padded[:spliced_len], theirs[0], atol=1e-3, rtol=1e-4
    )


def test_image_at_sequence_start_and_end(oracle_and_params):
    """Sentinel position edge cases: splice at index 0 and at the last
    position (empty trailing text, llava_arch.py:154-158 skip)."""
    oracle, params = oracle_and_params
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    for ids in ([IMAGE_TOKEN_INDEX, 4, 6, 2], [3, 8, IMAGE_TOKEN_INDEX]):
        spliced_len = len(ids) - 1 + N_IMG
        theirs, _, _, _ = _oracle_prefill(oracle, [ids], torch.tensor(pixels))
        ours, length = _mine_prefill(params, ids, jnp.asarray(pixels), spliced_len)
        assert length == theirs.shape[1]
        np.testing.assert_allclose(ours, theirs[0], atol=1e-3, rtol=1e-4)


def test_multi_image_ragged_batch_alignment(oracle_and_params):
    """3-row batch: 2-image, 1-image, text-only rows — exercises the ragged
    align path (llava_arch.py:168-193) and the text-only hacky branch
    (:109-121, which consumes one image feature but splices nothing).

    Images ride the STACKED-tensor path ([ΣB, 3, H, W]): the splice loop's
    global cur_image_idx walks one image per sentinel across the batch
    (:107,129,148) — the list/5-dim path has different per-SAMPLE-stack
    semantics, covered by test_list_path_per_sample_stacks.

    The reference's ragged alignment requires labels (its `_new_labels` is
    only bound under `labels is not None`; the no-labels ragged path raises
    NameError at :187 — the reference only ever runs batch=1) — so labels
    are passed to the oracle and ignored on our side.
    """
    oracle, params = oracle_and_params
    rng = np.random.default_rng(2)
    L = 10
    row0 = [1, IMAGE_TOKEN_INDEX, 5, 6, IMAGE_TOKEN_INDEX] + [7] * (L - 5)
    row1 = [2, 3, IMAGE_TOKEN_INDEX] + [9] * (L - 3)
    row2 = [4] * L  # text-only
    # 4 images: row0's two, row1's one, one consumed-but-unused by row2's
    # hacky branch
    imgs = rng.normal(size=(4, 3, 28, 28)).astype(np.float32)
    ids_rows = [row0, row1, row2]
    labels = torch.tensor(ids_rows, dtype=torch.long)
    theirs, attn, _, embeds = _oracle_prefill(
        oracle, ids_rows, torch.tensor(imgs), labels=labels
    )
    spliced_lens = [L + 2 * (N_IMG - 1), L + (N_IMG - 1), L]
    assert theirs.shape[1] == max(spliced_lens)
    assert attn.numpy().sum(axis=1).tolist() == spliced_lens

    row_imgs = [imgs[0:2], imgs[2:3], None]
    for row, (ids, im, true_len) in enumerate(
        zip(ids_rows, row_imgs, spliced_lens)
    ):
        ours, length = _mine_prefill(
            params, ids, jnp.asarray(im) if im is not None else None, true_len
        )
        assert length == true_len
        np.testing.assert_allclose(
            ours, theirs[row, :true_len], atol=1e-3, rtol=1e-4,
            err_msg=f"row {row}",
        )


def test_list_path_per_sample_stacks(oracle_and_params):
    """The list/5-dim images path (llava_arch.py:96-101): each list entry is
    one SAMPLE's image stack, flattened to [n_i*N, D] and consumed whole at
    that sample's single sentinel (anyres-style multi-crop). Rows: a 2-crop
    sample and a 1-crop sample."""
    from llava_align_tpu.models import llama as llama_mod

    oracle, params = oracle_and_params
    rng = np.random.default_rng(4)
    L = 8
    ids_rows = [
        [1, IMAGE_TOKEN_INDEX] + [5] * (L - 2),
        [2, 3, IMAGE_TOKEN_INDEX] + [9] * (L - 3),
    ]
    imgs = [
        rng.normal(size=(2, 3, 28, 28)).astype(np.float32),
        rng.normal(size=(1, 3, 28, 28)).astype(np.float32),
    ]
    labels = torch.tensor(ids_rows, dtype=torch.long)
    theirs, attn, _, _ = _oracle_prefill(
        oracle, ids_rows, [torch.tensor(i) for i in imgs], labels=labels
    )
    spliced_lens = [L - 1 + 2 * N_IMG, L - 1 + N_IMG]
    assert attn.numpy().sum(axis=1).tolist() == spliced_lens

    for row, (ids, im, true_len) in enumerate(zip(ids_rows, imgs, spliced_lens)):
        # one sentinel expands to n_i*N slots: plan with that per-sentinel
        # count and hand it the flattened per-sample feature stack
        n_slots = im.shape[0] * N_IMG
        plan = llava.plan_splice(ids, n_slots, true_len)
        feats = llava.encode_images(params, CFG, jnp.asarray(im))
        feats = feats.reshape(1, -1, feats.shape[-1])
        embeds = llava.splice_embeds(
            params, CFG,
            jnp.asarray(plan.tokens)[None], jnp.asarray(plan.tok_gather)[None],
            jnp.asarray(plan.img_gather)[None], jnp.asarray(plan.is_image)[None],
            feats,
        )
        positions = jnp.arange(true_len, dtype=jnp.int32)[None]
        hidden, _ = llama_mod.forward(
            params["llama"], CFG.text, embeds, positions, attn_impl="xla"
        )
        ours = np.asarray(llama_mod.logits_from_hidden(params["llama"], hidden[0]))
        np.testing.assert_allclose(
            ours, theirs[row, :true_len], atol=1e-3, rtol=1e-4,
            err_msg=f"row {row}",
        )


def test_decode_step_shortcut_and_greedy_parity(oracle_and_params):
    """Greedy continuation through the reference's cached decode path: each
    step enters the input_ids.shape[1]==1 shortcut (llava_arch.py:91-94),
    which must leave ids untouched and rebuild the mask as ones(past+1).
    Ours recomputes the full spliced forward each step (cache≡full is pinned
    separately in the engine tests); tokens and final-step logits must match.
    """
    oracle, params = oracle_and_params
    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids = [1, 5, IMAGE_TOKEN_INDEX, 7, 9]
    spliced_len = len(ids) - 1 + N_IMG
    steps = 4

    theirs_logits, attn, pkv, _ = _oracle_prefill(
        oracle, [ids], torch.tensor(pixels)
    )
    their_tokens = []
    cur = int(theirs_logits[0, -1].argmax())
    their_tokens.append(cur)
    last_step_logits = None
    with torch.no_grad():
        for _ in range(steps - 1):
            step_ids = torch.tensor([[cur]], dtype=torch.long)
            step_mask = torch.ones((1, 1), dtype=torch.bool)
            (ids2, attn2, pkv2, embeds2, _) = (
                oracle.prepare_inputs_labels_for_multimodal(
                    step_ids, step_mask, pkv, None, torch.tensor(pixels)
                )
            )
            # the shortcut's contract (llava_arch.py:91-94)
            assert embeds2 is None and torch.equal(ids2, step_ids)
            assert attn2.shape[1] == pkv[-1][-1].shape[-2] + 1
            assert bool(attn2.all())
            out = oracle.model(
                input_ids=ids2, attention_mask=attn2,
                past_key_values=pkv2, use_cache=True,
            )
            pkv = out.past_key_values
            last_step_logits = oracle.lm_head(out.last_hidden_state)[0, -1].numpy()
            cur = int(last_step_logits.argmax())
            their_tokens.append(cur)

    mine_tokens = []
    cur_ids = list(ids)
    mine_last_logits = None
    for step in range(steps):
        pad_to = spliced_len + steps  # one static bucket for all steps
        logits, length = _mine_prefill(
            params, cur_ids, jnp.asarray(pixels), pad_to
        )
        mine_last_logits = logits[length - 1]
        tok = int(mine_last_logits.argmax())
        mine_tokens.append(tok)
        cur_ids.append(tok)

    assert mine_tokens == their_tokens
    np.testing.assert_allclose(
        mine_last_logits, last_step_logits, atol=1e-3, rtol=1e-4
    )
