"""ALPRO + TimeSformer parity vs the reference torch modules as oracles.

TimeSformer (lavis/models/timesformer/vit.py, imported read-only with a
fairscale stub) pins the divided space-time attention math; the fusion BERT
(med.py, ALPRO config: fusion_layer, add_cross_attention=false) and the
QA/retrieval compositions (alpro_qa.py:65-96, alpro_retrieval.py:65-240) are
pinned by torch re-composition on shared tiny weights.
"""

import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import alpro, timesformer as tsf
from llava_align_tpu.models.alpro import AlproConfig
from llava_align_tpu.models.timesformer import TimeSformerConfig
from llava_align_tpu.utils.hf_convert import convert_timesformer

V = 64
D = 32


from tests.stub_utils import stub_module as _stub  # noqa: E402


@pytest.fixture(scope="module")
def ref_vit():
    _stub("fairscale")
    _stub("fairscale.nn")
    _stub("fairscale.nn.checkpoint")
    _stub(
        "fairscale.nn.checkpoint.checkpoint_activations",
        checkpoint_wrapper=lambda m, *a, **k: m,
    )
    for name in ("lavis", "lavis.models"):
        if name not in sys.modules:
            _stub(name)
    pkg = types.ModuleType("lavis.models.timesformer")
    pkg.__path__ = ["/root/reference/experiments/lavis/models/timesformer"]
    sys.modules["lavis.models.timesformer"] = pkg
    return importlib.import_module("lavis.models.timesformer.vit")


@pytest.fixture(scope="module")
def tsf_models(ref_vit):
    from functools import partial

    cfg = TimeSformerConfig.tiny()
    torch.manual_seed(0)
    hf = ref_vit.VisionTransformer(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.hidden_size, depth=cfg.num_layers,
        num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        num_frames=cfg.num_frames, attention_type="divided_space_time",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    ).eval()
    with torch.no_grad():
        # init zeroes pos/time/temporal_fc — randomize for a strong test
        hf.pos_embed.normal_(0, 0.02)
        hf.time_embed.normal_(0, 0.02)
        hf.cls_token.normal_(0, 0.02)
        for n, p in hf.named_parameters():
            if "temporal_fc" in n or "bias" in n:
                p.normal_(0, 0.02)
    params = convert_timesformer(
        {k: v.detach() for k, v in hf.state_dict().items()}, cfg, prefix=""
    )
    return hf, cfg, params


def test_timesformer_features_match_reference(tsf_models):
    hf, cfg, params = tsf_models
    rng = np.random.default_rng(0)
    B, T = 2, cfg.num_frames
    pixels = rng.normal(size=(B, 3, T, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        want = hf.forward_features(torch.tensor(pixels)).numpy()  # [B, 1+N*T, D]
    got = np.asarray(
        tsf.forward_features(params, cfg, jnp.asarray(pixels), pool_frames=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_timesformer_pooled_matches_reference(tsf_models):
    """TimeSformer wrapper pooling: cls + time-averaged patches
    (vit.py:596-612)."""
    hf, cfg, params = tsf_models
    rng = np.random.default_rng(1)
    B, T, N = 2, cfg.num_frames, cfg.num_patches
    H = W = cfg.image_size // cfg.patch_size
    pixels = rng.normal(size=(B, 3, T, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        x = hf.forward_features(torch.tensor(pixels))
        cls_tok = x[:, 0:1]
        other = x[:, 1:].reshape(B, H * W, T, cfg.hidden_size).mean(dim=2)
        want = torch.cat([cls_tok, other], dim=1).numpy()
    got = np.asarray(
        tsf.forward_features(params, cfg, jnp.asarray(pixels), pool_frames=True)
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def ref_med():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))
    _stub("lavis.common")
    _stub("lavis.common.utils", get_abs_path=lambda p: p)
    _stub("lavis.models.base_model", BaseEncoder=torch.nn.Module)
    if "lavis" not in sys.modules:
        _stub("lavis")
    if "lavis.models" not in sys.modules:
        _stub("lavis.models")
    spec = importlib.util.spec_from_file_location(
        "ref_med_alpro", "/root/reference/experiments/lavis/models/med.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_med_alpro"] = mod
    spec.loader.exec_module(mod)
    return mod


def _alpro_bert(ref_med, num_layers=4, fusion_layer=2):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=num_layers,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        pad_token_id=0, attn_implementation="eager",
    )
    # bert_config_alpro.json: fusion without cross-attention
    cfg.fusion_layer = fusion_layer
    cfg.encoder_width = D
    cfg.add_type_embeddings = True
    cfg.add_cross_attention = False
    torch.manual_seed(3)
    hf = ref_med.BertModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "bias" in n:
                p.normal_(0, 0.02)
    return hf


def test_alpro_fusion_is_concat_self_attention(ref_med):
    """Text layers 0..fl-1 on the question, fusion layers fl..L-1 over the
    concatenated [text; video] embeds — no cross-attention anywhere
    (alpro_qa.py:87-96)."""
    from llava_align_tpu.utils.hf_convert import convert_alpro

    hf = _alpro_bert(ref_med)
    cfg = AlproConfig.tiny(vocab_size=V)
    sd = {f"text_encoder.{k}": v.detach() for k, v in hf.state_dict().items()}
    # dummy timesformer weights for the converter's visual branch
    tparams_rng = jax.random.PRNGKey(0)
    text_params = convert_alpro(
        {**sd, **_dummy_tsf_sd(cfg.video)}, cfg, variant="retrieval"
    )["text"]

    rng = np.random.default_rng(4)
    b, st, sv = 2, 6, 5
    ids = rng.integers(1, V, (b, st))
    mask = np.ones((b, st), np.int64)
    mask[1, 4:] = 0
    video_embeds = rng.normal(size=(b, sv, D)).astype(np.float32) * 0.3

    with torch.no_grad():
        t_out = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            token_type_ids=torch.zeros((b, st), dtype=torch.long),
            mode="text",
        ).last_hidden_state
        emb = torch.cat([t_out, torch.tensor(video_embeds)], dim=1)
        am = torch.cat(
            [torch.tensor(mask), torch.ones((b, sv), dtype=torch.long)], dim=1
        )
        want = hf(
            encoder_embeds=emb, attention_mask=am, mode="fusion"
        ).last_hidden_state.numpy()

    params = {"text": text_params}
    te = alpro.encode_text(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    got = np.asarray(alpro.fuse(params, cfg, te, jnp.asarray(mask), jnp.asarray(video_embeds)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def _dummy_tsf_sd(vcfg):
    """Zero/identity torch-free timesformer state dict entries so
    convert_alpro can build the visual branch in text-only tests."""
    sd = {}
    D_, L = vcfg.hidden_size, vcfg.num_layers
    P, N, T = vcfg.patch_size, vcfg.num_patches, vcfg.num_frames
    sd["visual_encoder.model.cls_token"] = np.zeros((1, 1, D_), np.float32)
    sd["visual_encoder.model.pos_embed"] = np.zeros((1, N + 1, D_), np.float32)
    sd["visual_encoder.model.time_embed"] = np.zeros((1, T, D_), np.float32)
    sd["visual_encoder.model.patch_embed.proj.weight"] = np.zeros((D_, 3, P, P), np.float32)
    sd["visual_encoder.model.patch_embed.proj.bias"] = np.zeros((D_,), np.float32)
    for i in range(L):
        p = f"visual_encoder.model.blocks.{i}."
        for base, (o, ii) in {
            "temporal_attn.qkv": (3 * D_, D_), "temporal_attn.proj": (D_, D_),
            "temporal_fc": (D_, D_), "attn.qkv": (3 * D_, D_), "attn.proj": (D_, D_),
            "mlp.fc1": (vcfg.ffn_dim, D_), "mlp.fc2": (D_, vcfg.ffn_dim),
        }.items():
            sd[p + base + ".weight"] = np.zeros((o, ii), np.float32)
            sd[p + base + ".bias"] = np.zeros((o,), np.float32)
        for ln in ("temporal_norm1", "norm1", "norm2"):
            sd[p + ln + ".weight"] = np.ones((D_,), np.float32)
            sd[p + ln + ".bias"] = np.zeros((D_,), np.float32)
    sd["visual_encoder.model.norm.weight"] = np.ones((D_,), np.float32)
    sd["visual_encoder.model.norm.bias"] = np.zeros((D_,), np.float32)
    return sd


def test_alpro_qa_and_retrieval_run():
    cfg = AlproConfig.tiny(vocab_size=V, num_classes=3)
    qa_params = alpro.init(jax.random.PRNGKey(0), cfg, variant="qa")
    rng = np.random.default_rng(5)
    b, s, T = 2, 6, cfg.video.num_frames
    video = rng.normal(size=(b, 3, T, 32, 32)).astype(np.float32)
    ids = rng.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    targets = np.asarray([0, 2])
    loss, logits = alpro.qa_loss(
        qa_params, cfg, jnp.asarray(video), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(targets),
    )
    assert logits.shape == (b, 3) and np.isfinite(float(loss))

    rcfg = AlproConfig.tiny(vocab_size=V)
    rp = alpro.init(jax.random.PRNGKey(1), rcfg, variant="retrieval")
    b = 4
    video = rng.normal(size=(b, 3, T, 32, 32)).astype(np.float32)
    ids = rng.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    losses = alpro.retrieval_train_step(
        rp, rcfg, jax.random.PRNGKey(2), jnp.asarray(video), jnp.asarray(ids),
        jnp.asarray(mask),
    )
    assert np.isfinite(float(losses["loss"]))
    g = jax.grad(
        lambda p: alpro.retrieval_train_step(
            p, rcfg, jax.random.PRNGKey(2), jnp.asarray(video),
            jnp.asarray(ids), jnp.asarray(mask),
        )["loss"]
    )(rp)
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0

    v2t, t2v = alpro.compute_sim_matrix(
        rp, rcfg, jnp.asarray(video[:3]), jnp.asarray(ids), jnp.asarray(mask),
        k_test=2,
    )
    assert v2t.shape == (3, 4) and t2v.shape == (4, 3)
    assert ((v2t > -100).sum(axis=1) == 2).all()


def test_alpro_retrieval_sharded_vtc_matches_reference_semantics():
    """Under shard_map over a data axis, the all-gathered VTC must equal the
    single-device VTC on the full batch (the reference's
    all_gather_with_grad semantics)."""
    devs = jax.devices()
    if len(devs) < 2 or devs[0].platform != "cpu":
        pytest.skip("needs multi-device CPU mesh")
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    cfg = AlproConfig.tiny(vocab_size=V)
    params = alpro.init(jax.random.PRNGKey(0), cfg, variant="retrieval")
    rng = np.random.default_rng(6)
    b, s, T = 4, 6, cfg.video.num_frames
    video = jnp.asarray(rng.normal(size=(b, 3, T, 32, 32)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, V, (b, s)))
    mask = jnp.asarray(np.ones((b, s), np.int64))

    feats = alpro.vtc_features(params, cfg, video=video, ids=ids, mask=mask)

    def local_vtc(vf, tf, g_vf, g_tf, rank, temp):
        sim_v2t = vf @ g_tf.T / temp
        sim_t2v = tf @ g_vf.T / temp
        n = vf.shape[0]
        t0 = jnp.zeros_like(sim_v2t)
        t0 = jax.lax.dynamic_update_slice(t0, jnp.eye(n, dtype=t0.dtype), (0, rank * n))
        l1 = -(jax.nn.log_softmax(sim_v2t, axis=1) * t0).sum(1)
        l2 = -(jax.nn.log_softmax(sim_t2v, axis=1) * t0).sum(1)
        return l1, l2

    temp = jnp.clip(params["temp"], 0.001, 0.5)
    want1, want2 = local_vtc(
        feats["video_feat"], feats["text_feat"], feats["video_feat"],
        feats["text_feat"], jnp.zeros((), jnp.int32), temp,
    )

    mesh = Mesh(np.array(devs[:2]), ("data",))

    def shard_fn(vf, tf):
        g_vf = jax.lax.all_gather(vf, "data", tiled=True)
        g_tf = jax.lax.all_gather(tf, "data", tiled=True)
        rank = jax.lax.axis_index("data")
        return local_vtc(vf, tf, g_vf, g_tf, rank, temp)

    got1, got2 = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=(P("data"), P("data")),
    )(feats["video_feat"], feats["text_feat"])
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5, rtol=1e-5)


def test_zoo_registers_alpro_archs():
    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.registry import registry

    for arch in ("alpro_retrieval", "alpro_qa"):
        assert registry.get_model_class(arch) is not None, arch
