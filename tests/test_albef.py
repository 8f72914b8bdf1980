"""ALBEF parity vs the reference lavis/models/med.py fusion-BERT oracle.

The reference med.py (imported read-only as a torch oracle) implements the
ALBEF text encoder: fusion_layer splits the stack into text-only layers and
cross-attending layers, with modes text/fusion/multimodal
(med.py:395-470,526-604) and a list-encoder path for NLVR2's two images
(med.py:451-470). These tests pin models/albef.py + the MedConfig.fusion_layer
extension in models/blip.py to that math, plus the VQA rank_answers math
(albef_vqa.py:269-346) against a torch re-composition with label-smoothed
LM loss (med.py:1235-1244).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import albef
from llava_align_tpu.models.albef import AlbefConfig
from llava_align_tpu.models.blip import MedConfig, med_forward, med_logits
from llava_align_tpu.utils.hf_convert import convert_med

V = 64
D = 32


from tests.stub_utils import stub_module as _stub  # noqa: E402


def _load_by_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_med():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))

    _stub("lavis")
    _stub("lavis.common")
    _stub("lavis.common.utils", get_abs_path=lambda p: p)
    _stub("lavis.models")
    _stub("lavis.models.base_model", BaseEncoder=torch.nn.Module)
    return _load_by_path("ref_med", "/root/reference/experiments/lavis/models/med.py")


def _bert_cfg(ref_med, num_layers, fusion_layer):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=num_layers,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        pad_token_id=0, attn_implementation="eager",
    )
    cfg.fusion_layer = fusion_layer
    cfg.encoder_width = D
    cfg.add_type_embeddings = False
    cfg.add_cross_attention = True
    return cfg


def _randomize_biases(model):
    with torch.no_grad():
        for n, p in model.named_parameters():
            if "bias" in n:
                p.normal_(0, 0.02)


def _convert_fusion(sd, cfg: MedConfig):
    """Zero-fill crossattention keys for pre-fusion layers, then convert."""
    sd = dict(sd)
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}.crossattention."
        if base + "self.query.weight" not in sd:
            for name in ("self.query", "self.key", "self.value", "output.dense"):
                sd[base + name + ".weight"] = torch.zeros(D, D)
                sd[base + name + ".bias"] = torch.zeros(D)
            sd[base + "output.LayerNorm.weight"] = torch.ones(D)
            sd[base + "output.LayerNorm.bias"] = torch.zeros(D)
    return convert_med(sd, cfg, prefix="", head_prefix="__none__.")


@pytest.fixture(scope="module")
def fusion_models(ref_med):
    torch.manual_seed(0)
    hf = ref_med.BertModel(_bert_cfg(ref_med, 4, 2), add_pooling_layer=False).eval()
    _randomize_biases(hf)
    cfg = MedConfig(
        vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
    )
    params = _convert_fusion({k: v.detach() for k, v in hf.state_dict().items()}, cfg)
    return hf, cfg, params


def _data(seed=0, b=2, s=7, se=5):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    mask[1, 5:] = 0
    enc = rng.normal(size=(b, se, D)).astype(np.float32) * 0.3
    enc_mask = np.ones((b, se), np.int64)
    enc_mask[0, 4:] = 0
    return ids, mask, enc, enc_mask


def test_text_mode_runs_prefusion_layers_only(fusion_models):
    hf, cfg, params = fusion_models
    ids, mask, _, _ = _data()
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            mode="text",
        ).last_hidden_state.numpy()
    got = np.asarray(med_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask), mode="text"))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_multimodal_mode_cross_from_fusion_layer(fusion_models):
    hf, cfg, params = fusion_models
    ids, mask, enc, enc_mask = _data(1)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
            mode="multimodal",
        ).last_hidden_state.numpy()
    got = np.asarray(med_forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        encoder_states=jnp.asarray(enc), encoder_mask=jnp.asarray(enc_mask),
        mode="multimodal",
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fusion_mode_continues_from_embeds(fusion_models):
    hf, cfg, params = fusion_models
    ids, mask, enc, enc_mask = _data(2)
    emb = np.random.default_rng(3).normal(size=(2, 7, D)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf(
            encoder_embeds=torch.tensor(emb), attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
            mode="fusion",
        ).last_hidden_state.numpy()
    got = np.asarray(med_forward(
        params, cfg, None, jnp.asarray(mask),
        encoder_states=jnp.asarray(enc), encoder_mask=jnp.asarray(enc_mask),
        mode="fusion", input_embeds=jnp.asarray(emb),
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_nlvr_alternating_cross_attention(ref_med):
    """NLVR2 list-encoder path: fusion layer i attends image[(i-fl) % 2]."""
    torch.manual_seed(4)
    hf = ref_med.BertModel(_bert_cfg(ref_med, 6, 2), add_pooling_layer=False).eval()
    _randomize_biases(hf)
    cfg = MedConfig(
        vocab_size=V, hidden_size=D, num_layers=6, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
    )
    params = _convert_fusion({k: v.detach() for k, v in hf.state_dict().items()}, cfg)
    ids, mask, e0, m0 = _data(5)
    _, _, e1, m1 = _data(6)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            encoder_hidden_states=[torch.tensor(e0), torch.tensor(e1)],
            encoder_attention_mask=[torch.tensor(m0), torch.tensor(m1)],
            mode="multimodal",
        ).last_hidden_state.numpy()
    got = np.asarray(med_forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        encoder_states=(jnp.asarray(e0), jnp.asarray(e1)),
        encoder_mask=(jnp.asarray(m0), jnp.asarray(m1)),
        mode="multimodal",
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def vqa_decoder(ref_med):
    torch.manual_seed(7)
    cfg_t = _bert_cfg(ref_med, 2, 0)
    cfg_t.is_decoder = True
    cfg_t.add_cross_attention = True
    hf = ref_med.BertLMHeadModel(cfg_t).eval()
    _randomize_biases(hf)
    cfg = MedConfig(
        vocab_size=V, hidden_size=D, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, fusion_layer=0,
    )
    params = convert_med(
        {k: v.detach() for k, v in hf.state_dict().items()}, cfg,
        prefix="bert.", head_prefix="cls.",
    )
    return hf, cfg, params


def test_rank_answers_matches_reference_math(vqa_decoder):
    """Full two-stage ranking vs a torch re-composition of
    albef_vqa.py:269-346 on shared random question states."""
    hf, dec_cfg, dec_params = vqa_decoder
    rng = np.random.default_rng(8)
    nq, sq, na, sa, k = 3, 6, 10, 4, 4
    fused = rng.normal(size=(nq, sq, D)).astype(np.float32) * 0.3
    q_mask = np.ones((nq, sq), np.int64)
    q_mask[2, 4:] = 0
    # answers: [CLS]=2 then tokens, 0-padded
    answer_ids = np.zeros((na, sa), np.int64)
    answer_ids[:, 0] = 2
    lens = rng.integers(2, sa + 1, na)
    for i in range(na):
        answer_ids[i, 1 : lens[i]] = rng.integers(3, V, lens[i] - 1)
    answer_mask = (answer_ids != 0).astype(np.int64)

    # --- torch reference math ---
    with torch.no_grad():
        start_ids = torch.full((nq, 1), 2, dtype=torch.long)
        out = hf(
            start_ids,
            encoder_hidden_states=torch.tensor(fused),
            encoder_attention_mask=torch.tensor(q_mask),
            return_dict=True, reduction="none", is_decoder=True,
        )
        logits0 = out.logits[:, 0]
        prob_first = torch.softmax(logits0, dim=1)[:, torch.tensor(answer_ids[:, 1])]
        topk_probs, topk_ids = prob_first.topk(k, dim=1)
        input_ids = torch.tensor(answer_ids)[topk_ids.reshape(-1)]
        input_atts = torch.tensor(answer_mask)[topk_ids.reshape(-1)]
        targets = input_ids.masked_fill(input_ids == 0, -100)
        qs = torch.tensor(fused).repeat_interleave(k, dim=0)
        qa = torch.tensor(q_mask).repeat_interleave(k, dim=0)
        out = hf(
            input_ids, attention_mask=input_atts,
            encoder_hidden_states=qs, encoder_attention_mask=qa,
            labels=targets, return_dict=True, reduction="none", is_decoder=True,
        )
        log_probs_sum = (-out.loss).view(nq, k)
        max_topk_ids = log_probs_sum.argmax(dim=1)
        want = topk_ids[torch.arange(nq), max_topk_ids].numpy()

    # --- ours ---
    acfg = AlbefConfig.tiny(vocab_size=V)
    acfg = AlbefConfig(
        vision=acfg.vision, text=acfg.text,
        decoder=dec_cfg, embed_dim=acfg.embed_dim,
    )
    got = albef.rank_answers_from_states(
        {"decoder": dec_params}, acfg, jnp.asarray(fused), jnp.asarray(q_mask),
        jnp.asarray(answer_ids), jnp.asarray(answer_mask),
        num_ans_candidates=k, pad_token_id=0,
    )
    np.testing.assert_array_equal(got, want)


def test_queue_update_wraps_when_batch_not_divisor():
    """queue_size % bs != 0: the enqueue must WRAP (positions (ptr+i) % Q),
    not clamp — lax.dynamic_update_slice clamps a start near the queue end,
    silently desyncing the FIFO from ptr. The reference guards this with an
    assert (base_model _dequeue_and_enqueue); we handle it exactly."""
    cfg = AlbefConfig.tiny(vocab_size=V, queue_size=6)
    params = albef.init(jax.random.PRNGKey(0), cfg, variant="retrieval")
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    state = albef.init_queue_state(cfg, jax.random.PRNGKey(1))
    b, s = 4, 6
    data = np.random.default_rng(3)
    pixels = jnp.asarray(data.normal(size=(b, 3, 32, 32)).astype(np.float32))
    ids = jnp.asarray(data.integers(1, V, (b, s)))
    mask = jnp.ones((b, s), jnp.int32)
    idx1 = jnp.asarray([10, 11, 12, 13])
    idx2 = jnp.asarray([20, 21, 22, 23])
    _, m2, s1 = albef.retrieval_train_step(
        params, m_params, state, cfg, jax.random.PRNGKey(2),
        pixels, ids, mask, idx1,
    )
    assert int(s1["ptr"]) == 4
    _, _, s2 = albef.retrieval_train_step(
        params, m2, s1, cfg, jax.random.PRNGKey(3),
        pixels, ids, mask, idx2,
    )
    # second write lands at columns 4,5,0,1 (wrap); 2,3 keep batch-1 rows
    assert int(s2["ptr"]) == 2
    np.testing.assert_array_equal(
        np.asarray(s2["idx_queue"])[0], [22, 23, 12, 13, 20, 21]
    )


def test_retrieval_train_step_runs_and_updates_queue():
    cfg = AlbefConfig.tiny(vocab_size=V, queue_size=8)
    rng = jax.random.PRNGKey(0)
    params = albef.init(rng, cfg, variant="retrieval")
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    state = albef.init_queue_state(cfg, jax.random.PRNGKey(1))
    b, s = 4, 6
    data = np.random.default_rng(0)
    pixels = data.normal(size=(b, 3, 32, 32)).astype(np.float32)
    ids = data.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    idx = np.asarray([0, 1, 2, 1])
    losses, m2, s2 = albef.retrieval_train_step(
        params, m_params, state, cfg, jax.random.PRNGKey(2),
        jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(idx),
    )
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["loss_itc"]) > 0 and float(losses["loss_itm"]) > 0
    assert int(s2["ptr"]) == b
    np.testing.assert_array_equal(np.asarray(s2["idx_queue"])[0, :b], idx)
    # EMA math: m' = 0.995 m + 0.005 p
    m_half = jax.tree_util.tree_map(lambda x: x * 0.5, params)
    m3 = albef.momentum_update(params, m_half, momentum=0.995)
    leaf_p = jax.tree_util.tree_leaves(params)[0]
    leaf_m3 = jax.tree_util.tree_leaves(m3)[0]
    np.testing.assert_allclose(
        np.asarray(leaf_m3), np.asarray(leaf_p) * (0.995 * 0.5 + 0.005), rtol=1e-6
    )
    # gradient flows
    g = jax.grad(
        lambda p: albef.retrieval_train_step(
            p, m_params, state, cfg, jax.random.PRNGKey(2),
            jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(idx),
        )[0]["loss"]
    )(params)
    gn = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    )
    assert np.isfinite(gn) and gn > 0


def test_classification_and_nlvr_losses():
    cfg = AlbefConfig.tiny(vocab_size=V, num_classes=3)
    params = albef.init(jax.random.PRNGKey(0), cfg, variant="classification")
    data = np.random.default_rng(1)
    b, s = 2, 5
    pixels = data.normal(size=(b, 3, 32, 32)).astype(np.float32)
    ids = data.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    targets = np.asarray([0, 2])
    loss, logits = albef.classification_loss(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(targets),
    )
    assert logits.shape == (b, 3) and np.isfinite(float(loss))
    # distillation branch vs momentum copy of itself: loss finite, differs
    loss_d, _ = albef.classification_loss(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(targets), m_params=params, alpha=0.4,
    )
    assert np.isfinite(float(loss_d))

    ncfg = AlbefConfig.tiny(vocab_size=V, num_classes=2, nlvr=True)
    nparams = albef.init(jax.random.PRNGKey(1), ncfg, variant="nlvr")
    logits = albef.nlvr_forward(
        nparams, ncfg, jnp.asarray(pixels), jnp.asarray(pixels[::-1].copy()),
        jnp.asarray(ids), jnp.asarray(mask),
    )
    assert logits.shape == (b, 2)
    # swapping the two images must change the prediction (alternating cross)
    logits_sw = albef.nlvr_forward(
        nparams, ncfg, jnp.asarray(pixels[::-1].copy()), jnp.asarray(pixels),
        jnp.asarray(ids), jnp.asarray(mask),
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits_sw))


def test_feature_extractor_and_sim_matrix():
    cfg = AlbefConfig.tiny(vocab_size=V)
    params = albef.init(jax.random.PRNGKey(0), cfg, variant="retrieval")
    data = np.random.default_rng(2)
    ni, nt, s = 3, 4, 5
    pixels = data.normal(size=(ni, 3, 32, 32)).astype(np.float32)
    ids = data.integers(1, V, (nt, s))
    mask = np.ones((nt, s), np.int64)

    feats = albef.extract_features(
        params, cfg, pixels=jnp.asarray(pixels), ids=jnp.asarray(ids[:ni]),
        mask=jnp.asarray(mask[:ni]), mode="multimodal",
    )
    # per-token projections (albef_feature_extractor docstring shapes)
    assert feats["image_features"].shape == (ni, 1 + cfg.vision.num_patches, cfg.embed_dim)
    assert feats["text_features"].shape == (ni, s, cfg.embed_dim)
    assert feats["multimodal_embeds"].shape == (ni, s, cfg.text.hidden_size)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats["text_features"]), axis=-1), 1.0, atol=1e-5
    )

    i2t, t2i = albef.compute_sim_matrix(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        k_test=2,
    )
    assert i2t.shape == (ni, nt) and t2i.shape == (nt, ni)
    # exactly k_test entries per row re-ranked above the -100 floor
    assert ((i2t > -100).sum(axis=1) == 2).all()
    assert ((t2i > -100).sum(axis=1) == 2).all()


def test_zoo_registers_albef_archs():
    import llava_align_tpu  # noqa: F401 — triggers zoo registration
    from llava_align_tpu.framework.registry import registry

    for arch in ("albef_retrieval", "albef_vqa", "albef_classification",
                 "albef_nlvr", "albef_feature_extractor"):
        cls = registry.get_model_class(arch)
        assert cls is not None, arch
    model = registry.get_model_class("albef_vqa")(model_path=None)
    assert "decoder" in model.params
    model = registry.get_model_class("albef_nlvr")(model_path=None)
    assert "cls_head" in model.params
