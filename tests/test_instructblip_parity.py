"""InstructBLIP component parity vs the reference lavis implementations
(loaded by file path with stubbed timm/lavis deps as torch oracles):
EVA-ViT and the text-conditioned Q-Former with query-split FFN."""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import eva_vit, instructblip, qformer
from llava_align_tpu.models.eva_vit import EvaVitConfig
from llava_align_tpu.models.instructblip import InstructBlipConfig
from llava_align_tpu.models.qformer import QFormerConfig
from llava_align_tpu.utils.hf_convert import convert_eva_vit, convert_qformer

EVA_CFG = EvaVitConfig.tiny()
QF_CFG = QFormerConfig.tiny(encoder_width=EVA_CFG.width)


def _load_by_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


from tests.stub_utils import stub_module as _stub  # noqa: E402


@pytest.fixture(scope="module")
def ref_eva():
    # minimal stubs for timm + lavis.common.dist_utils (import-time only)
    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return (x, x) if not isinstance(x, tuple) else x

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", drop_path=drop_path, to_2tuple=to_2tuple, trunc_normal_=trunc_normal_)
    _stub("timm.models.registry", register_model=lambda f: f)
    _stub("lavis")
    _stub("lavis.common")
    _stub("lavis.common.dist_utils", download_cached_file=lambda *a, **k: None)

    mod = _load_by_path(
        "ref_eva_vit", "/root/reference/experiments/lavis/models/eva_vit.py"
    )
    torch.manual_seed(0)
    from functools import partial

    model = mod.VisionTransformer(
        img_size=EVA_CFG.image_size,
        patch_size=EVA_CFG.patch_size,
        embed_dim=EVA_CFG.width,
        depth=EVA_CFG.num_layers,
        num_heads=EVA_CFG.num_heads,
        mlp_ratio=EVA_CFG.mlp_ratio,
        qkv_bias=True,
        use_mean_pooling=False,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    # randomize biases too (init leaves them zero → weak test otherwise)
    with torch.no_grad():
        for n, p in model.named_parameters():
            if "bias" in n or n.endswith(("q_bias", "v_bias")):
                p.normal_(0, 0.02)
    return model


def test_eva_vit_parity(ref_eva):
    params = convert_eva_vit(
        {k: v.detach() for k, v in ref_eva.state_dict().items()}, EVA_CFG, prefix=""
    )
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = ref_eva(torch.tensor(imgs)).numpy()
    ours = np.asarray(eva_vit.forward(params, EVA_CFG, jnp.asarray(imgs)))
    assert ours.shape == ref.shape  # [2, 1+4, 32]
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def ref_qformer():
    # new transformers moved these helpers to pytorch_utils; re-export so the
    # vendored (older-transformers) Qformer imports cleanly
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))

    mod = _load_by_path(
        "ref_qformer",
        "/root/reference/experiments/lavis/models/blip2_models/Qformer.py",
    )
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=QF_CFG.vocab_size,
        hidden_size=QF_CFG.hidden_size,
        num_hidden_layers=QF_CFG.num_layers,
        num_attention_heads=QF_CFG.num_heads,
        intermediate_size=QF_CFG.intermediate_size,
        max_position_embeddings=QF_CFG.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = QF_CFG.encoder_width
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = QF_CFG.cross_attention_freq
    cfg.query_length = QF_CFG.query_length
    torch.manual_seed(1)
    model = mod.BertModel(cfg, add_pooling_layer=False).eval()
    return model


def test_qformer_parity_text_conditioned(ref_qformer):
    params = convert_qformer(
        {k: v.detach() for k, v in ref_qformer.state_dict().items()}, QF_CFG, prefix=""
    )
    rng = np.random.default_rng(2)
    B, Q, T, N = 2, QF_CFG.query_length, 7, 5
    text_ids = rng.integers(5, 100, (B, T))
    text_mask = np.ones((B, T), np.int64)
    text_mask[1, 5:] = 0  # ragged text
    queries = rng.normal(size=(B, Q, QF_CFG.hidden_size)).astype(np.float32) * 0.05
    image_embeds = rng.normal(size=(B, N, QF_CFG.encoder_width)).astype(np.float32)

    with torch.no_grad():
        ref = ref_qformer(
            torch.tensor(text_ids),
            attention_mask=torch.cat(
                [torch.ones(B, Q, dtype=torch.long), torch.tensor(text_mask)], dim=1
            ),
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(image_embeds),
            encoder_attention_mask=torch.ones(B, N, dtype=torch.long),
            return_dict=True,
        ).last_hidden_state.numpy()

    ours = np.asarray(
        qformer.forward(
            params, QF_CFG,
            jnp.asarray(queries), jnp.asarray(image_embeds),
            text_ids=jnp.asarray(text_ids), text_mask=jnp.asarray(text_mask),
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_qformer_parity_queries_only(ref_qformer):
    params = convert_qformer(
        {k: v.detach() for k, v in ref_qformer.state_dict().items()}, QF_CFG, prefix=""
    )
    rng = np.random.default_rng(3)
    B, Q, N = 1, QF_CFG.query_length, 5
    queries = rng.normal(size=(B, Q, QF_CFG.hidden_size)).astype(np.float32) * 0.05
    image_embeds = rng.normal(size=(B, N, QF_CFG.encoder_width)).astype(np.float32)
    with torch.no_grad():
        ref = ref_qformer(
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(image_embeds),
            encoder_attention_mask=torch.ones(B, N, dtype=torch.long),
            return_dict=True,
        ).last_hidden_state.numpy()
    ours = np.asarray(
        qformer.forward(params, QF_CFG, jnp.asarray(queries), jnp.asarray(image_embeds))
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_instructblip_encode_shapes():
    cfg = InstructBlipConfig.tiny()
    params = instructblip.init(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28), jnp.float32)
    text = jnp.asarray([[5, 6, 7], [8, 9, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1], [1, 1, 0]], jnp.int32)
    out = instructblip.encode(params, cfg, imgs, text, mask)
    assert out.shape == (2, cfg.num_query_tokens, cfg.text.hidden_size)
    assert np.isfinite(np.asarray(out)).all()
