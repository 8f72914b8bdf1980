"""ALBEF retrieval TRAINING parity vs the reference AlbefRetrieval class.

The reference class itself (albef_models/albef_retrieval.py, loaded
read-only with omegaconf/timm/fairscale stubs and a fake tokenizer) is run
forward on tiny random weights; our functional retrieval_train_step runs on
the converted state dict with the reference's own queue buffers copied in.
The deterministic pieces must match: ITC loss (momentum features, queue
negatives, distilled soft targets) and the queue update. The ITM term draws
hard negatives stochastically (torch.multinomial vs jax categorical) and is
compared only for finiteness.
"""

import importlib.machinery
import importlib.util
import sys
import types
from functools import partial

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from llava_align_tpu.models import albef
from llava_align_tpu.models.albef import AlbefConfig
from llava_align_tpu.models.blip import BlipVitConfig, MedConfig
from llava_align_tpu.utils.hf_convert import convert_albef

V, D = 64, 32


from tests.stub_utils import stub_module as _stub  # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_albef_retrieval():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))

    class Registry:
        @staticmethod
        def register_model(name):
            return lambda c: c

    class MetricLogger:
        def __init__(self, *a, **k):
            pass

        def log_every(self, it, *a, **k):
            return iter(it)

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768):
            super().__init__()
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    def trunc_normal_(t, std=1.0, **k):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    class DropPath(nn.Module):
        def forward(self, x):
            return x

    _stub("omegaconf", OmegaConf=types.SimpleNamespace(
        load=lambda *a: {}, create=lambda *a, **k: {}
    ))
    for name in ("lavis", "lavis.common"):
        if name not in sys.modules:
            _stub(name)
    _stub("lavis.common.utils", get_abs_path=lambda p: p, is_url=lambda u: False)
    _stub(
        "lavis.common.dist_utils",
        download_cached_file=lambda *a, **k: None,
        is_dist_avail_and_initialized=lambda: False,
        get_world_size=lambda: 1, get_rank=lambda: 0,
        is_main_process=lambda: True, main_process=lambda f: f,
    )
    _stub("lavis.common.logger", MetricLogger=MetricLogger)
    _stub("lavis.common.registry", registry=Registry)
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.vision_transformer", _cfg=lambda *a, **k: {}, PatchEmbed=PatchEmbed)
    _stub("timm.models.registry", register_model=lambda f: f)
    _stub("timm.models.layers", trunc_normal_=trunc_normal_, DropPath=DropPath,
          to_2tuple=lambda x: (x, x))
    _stub("timm.models.helpers", named_apply=lambda *a, **k: None,
          adapt_input_conv=lambda *a, **k: None)
    _stub("fairscale")
    _stub("fairscale.nn")
    _stub("fairscale.nn.checkpoint")
    _stub("fairscale.nn.checkpoint.checkpoint_activations",
          checkpoint_wrapper=lambda m, *a, **k: m)

    ROOT = "/root/reference/experiments/lavis/models/"
    if "lavis.models" not in sys.modules:
        _stub("lavis.models")
    _load("lavis.models.base_model", ROOT + "base_model.py")
    med = _load("lavis.models.med", ROOT + "med.py")
    vit = _load("lavis.models.vit", ROOT + "vit.py")
    _load("lavis.models.albef_models", ROOT + "albef_models/__init__.py")
    _load("lavis.models.albef_models.albef_outputs",
          ROOT + "albef_models/albef_outputs.py")
    ret_mod = _load("ref_albef_retrieval", ROOT + "albef_models/albef_retrieval.py")
    return ret_mod, med, vit


class _FakeBatch:
    def __init__(self, ids, mask):
        self.input_ids = ids
        self.attention_mask = mask

    def to(self, device):
        return self


def test_retrieval_itc_and_queue_match_reference(ref_albef_retrieval):
    ret_mod, med, vit = ref_albef_retrieval
    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = False
    bcfg.add_cross_attention = True
    torch.manual_seed(0)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D
    ret_mod.AlbefRetrieval.init_tokenizer = classmethod(lambda cls: None)
    model = ret_mod.AlbefRetrieval(
        image_encoder=img_enc, text_encoder=text_enc, queue_size=16,
        embed_dim=16, temp=0.07, use_distill=True, momentum=0.995, alpha=0.4,
        max_txt_len=8,
    ).eval()

    rng = np.random.default_rng(0)
    b, s = 4, 6
    ids = torch.tensor(rng.integers(1, V, (b, s)))
    mask = torch.ones((b, s), dtype=torch.long)
    model.tokenizer = lambda caption, **k: _FakeBatch(ids, mask)
    imgs = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    idx = torch.tensor([0, 1, 2, 1])

    # snapshot the reference's randomly-initialized queues BEFORE forward
    q_img0 = model.image_queue.clone().numpy()
    q_txt0 = model.text_queue.clone().numpy()

    with torch.no_grad():
        out = model({
            "image": imgs, "text_input": ["x"] * b, "image_id": idx,
            "epoch": 5, "iters": 0, "num_iters_per_epoch": 1,
        })
    want_itc = float(out.loss_itc)
    want_q_img = model.image_queue.clone().numpy()
    want_q_txt = model.text_queue.clone().numpy()
    want_ptr = int(model.queue_ptr)

    # --- ours on the converted weights + identical queue state ---
    cfg = AlbefConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=2.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        embed_dim=16, queue_size=16,
    )
    params = convert_albef(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg,
        variant="retrieval",
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    state = {
        "image_queue": jnp.asarray(q_img0),
        "text_queue": jnp.asarray(q_txt0),
        "idx_queue": jnp.full((1, 16), -100, jnp.int32),
        "ptr": jnp.zeros((), jnp.int32),
    }
    losses, _, new_state = albef.retrieval_train_step(
        params, m_params, state, cfg, jax.random.PRNGKey(0),
        jnp.asarray(imgs.numpy()), jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()), jnp.asarray(idx.numpy()),
        alpha=0.4, momentum=0.995, use_distill=True,
    )
    np.testing.assert_allclose(float(losses["loss_itc"]), want_itc, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["image_queue"]), want_q_img, atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_state["text_queue"]), want_q_txt, atol=2e-4, rtol=1e-3
    )
    assert int(new_state["ptr"]) == want_ptr
    assert np.isfinite(float(losses["loss_itm"]))  # stochastic negatives — finite only
    np.testing.assert_array_equal(
        np.asarray(new_state["idx_queue"])[0, :b], idx.numpy()
    )



def _ensure_blip_chain():
    """Load the blip_models chain once (version-spoofed, read-only)."""
    ROOT = "/root/reference/experiments/lavis/models/"
    if "lavis.models.blip_models.blip" in sys.modules:
        return
    _load("lavis.models.blip_models", ROOT + "blip_models/__init__.py")
    _load("lavis.models.blip_models.blip_outputs",
          ROOT + "blip_models/blip_outputs.py")
    import transformers as _tf

    rv = _tf.__version__
    _tf.__version__ = "4.25.0"
    try:
        bb = _load("lavis.models.blip_models.blip", ROOT + "blip_models/blip.py")
    finally:
        _tf.__version__ = rv
    bb.BlipBase.init_tokenizer = classmethod(lambda cls: None)
    bb.transformers = types.SimpleNamespace(__version__="4.25.0")


def test_blip_retrieval_itc_and_queue_match_reference(ref_albef_retrieval):
    """Same oracle harness for BLIP retrieval (blip_models/blip_retrieval.py):
    BLIP med (cross-attention in every layer), deterministic ITC + queues."""
    _, med, vit = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    _ensure_blip_chain()
    ret_mod = _load("ref_blip_retrieval", ROOT + "blip_models/blip_retrieval.py")

    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = True  # BLIP med config keeps type embeddings
    bcfg.add_cross_attention = True  # BLIP med: cross in every layer
    torch.manual_seed(3)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D
    model = ret_mod.BlipRetrieval(
        image_encoder=img_enc, text_encoder=text_enc, queue_size=16,
        alpha=0.4, embed_dim=16, momentum=0.995, negative_all_rank=False,
        max_txt_len=8,
    ).eval()

    rng = np.random.default_rng(4)
    b, s = 4, 6
    ids = torch.tensor(rng.integers(3, V, (b, s)))
    mask = torch.ones((b, s), dtype=torch.long)

    class _Tok:
        enc_token_id = 1

        def __call__(self, caption, **k):
            return _FakeBatch(ids, mask)

    model.tokenizer = _Tok()
    imgs = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    idx = torch.tensor([0, 1, 2, 1])
    q_img0 = model.image_queue.clone().numpy()
    q_txt0 = model.text_queue.clone().numpy()

    with torch.no_grad():
        out = model({
            "image": imgs, "text_input": ["x"] * b, "image_id": idx,
            "epoch": 10, "iters": 0, "num_iters_per_epoch": 1,
        })
    want_itc = float(out.loss_itc)
    want_q_img = model.image_queue.clone().numpy()
    want_q_txt = model.text_queue.clone().numpy()

    # --- ours ---
    from llava_align_tpu.models import blip_variants as bv
    from llava_align_tpu.models.blip import BlipConfig
    from llava_align_tpu.utils.hf_convert import convert_blip_variant

    cfg = BlipConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=4.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
            # med.py adds no type vector for BLIP (token_type_ids=None)
            use_type_embeddings=False,
        ),
        embed_dim=16,
    )
    params = convert_blip_variant(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg, "retrieval"
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    state = {
        "image_queue": jnp.asarray(q_img0),
        "text_queue": jnp.asarray(q_txt0),
        "idx_queue": jnp.full((1, 16), -100, jnp.int32),
        "ptr": jnp.zeros((), jnp.int32),
    }
    enc_ids = jnp.asarray(ids.numpy()).at[:, 0].set(1)
    losses, _, new_state = bv.retrieval_train_step(
        params, m_params, state, cfg, jax.random.PRNGKey(0),
        jnp.asarray(imgs.numpy()), jnp.asarray(ids.numpy()), enc_ids,
        jnp.asarray(mask.numpy()), jnp.asarray(idx.numpy()),
        alpha=0.4, momentum=0.995, queue_size=16,
    )
    np.testing.assert_allclose(float(losses["loss_itc"]), want_itc, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["image_queue"]), want_q_img, atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_state["text_queue"]), want_q_txt, atol=2e-4, rtol=1e-3
    )
    assert np.isfinite(float(losses["loss_itm"]))



def _ensure_timesformer_pkg():
    ROOT = "/root/reference/experiments/lavis/models/"
    if "lavis.models.timesformer" not in sys.modules:
        tpkg = types.ModuleType("lavis.models.timesformer")
        tpkg.__spec__ = importlib.machinery.ModuleSpec("lavis.models.timesformer", None)
        tpkg.__path__ = [ROOT + "timesformer"]
        sys.modules["lavis.models.timesformer"] = tpkg
    _stub("lavis.common.config", node_to_dict=lambda n: dict(n))


def test_alpro_retrieval_vtc_matches_reference(ref_albef_retrieval):
    """ALPRO retrieval VTC parity vs the real AlproRetrieval class
    (TimeSformer video tower + no-cross fusion BERT): the deterministic
    in-batch VTC loss and similarity matrices must match; VTM negatives are
    stochastic and checked finite."""
    _, med, _ = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    _ensure_timesformer_pkg()
    _load("lavis.models.alpro_models", ROOT + "alpro_models/__init__.py")
    _load("lavis.models.alpro_models.alpro_outputs",
          ROOT + "alpro_models/alpro_outputs.py")
    import importlib as _il

    tsf_vit = _il.import_module("lavis.models.timesformer.vit")
    ret_mod = _load("ref_alpro_retrieval", ROOT + "alpro_models/alpro_retrieval.py")

    from transformers.models.bert.configuration_bert import BertConfig

    from llava_align_tpu.models.timesformer import TimeSformerConfig

    vcfg = TimeSformerConfig.tiny()
    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    # bert_config_alpro.json: fusion without cross-attention, type embeds on
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = True
    bcfg.add_cross_attention = False
    torch.manual_seed(6)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)

    ts = tsf_vit.TimeSformer(
        image_size=vcfg.image_size, patch_size=vcfg.patch_size,
        n_frms=vcfg.num_frames, attn_drop_rate=0.0, drop_path_rate=0.0,
        drop_rate=0.0,
    )
    # shrink to tiny dims: rebuild the inner VisionTransformer
    ts.model = tsf_vit.VisionTransformer(
        img_size=vcfg.image_size, patch_size=vcfg.patch_size,
        embed_dim=D, depth=vcfg.num_layers, num_heads=vcfg.num_heads,
        mlp_ratio=vcfg.mlp_ratio, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
        num_frames=vcfg.num_frames, attention_type="divided_space_time",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    with torch.no_grad():
        ts.model.pos_embed.normal_(0, 0.02)
        ts.model.time_embed.normal_(0, 0.02)
        ts.model.cls_token.normal_(0, 0.02)
        for n, p_ in ts.model.named_parameters():
            if "temporal_fc" in n or "bias" in n:
                p_.normal_(0, 0.02)
    ts.num_frames = vcfg.num_frames
    ts.img_size = vcfg.image_size

    ret_mod.AlproRetrieval.init_tokenizer = classmethod(lambda cls: None)
    # single-process: the world-gather of features is the identity
    ret_mod.all_gather_with_grad = lambda x: x
    # the vendored compute_vtm uses np.Inf (removed in NumPy 2)
    ret_mod.np = types.SimpleNamespace(Inf=float("inf"), inf=float("inf"))
    model = ret_mod.AlproRetrieval(
        visual_encoder=ts, text_encoder=text_enc,
        vision_width=D, text_width=D, embed_dim=16, max_txt_len=8, temp=0.07,
    ).eval()

    rng = np.random.default_rng(7)
    b, s, T = 4, 6, vcfg.num_frames
    ids = torch.tensor(rng.integers(3, V, (b, s)))
    mask = torch.ones((b, s), dtype=torch.long)
    model.tokenizer = lambda caption, **k: _FakeBatch(ids, mask)
    # reference forward expects (b, t, c, h, w) and permutes internally?
    # alpro_retrieval.py:72 unpacks b,t,c,h,w but feeds visual_encoder
    # directly — TimeSformer wants (b, c, t, h, w); match its actual usage
    video = torch.tensor(
        rng.normal(size=(b, 3, T, vcfg.image_size, vcfg.image_size)).astype(np.float32)
    )
    with torch.no_grad():
        out = model({
            "video": video, "text_input": ["x"] * b,
            "epoch": 0, "iters": 0, "num_iters_per_epoch": 1,
        })
    want_vtc = float(out.loss_vtc)

    # --- ours ---
    from llava_align_tpu.models import alpro
    from llava_align_tpu.models.alpro import AlproConfig
    from llava_align_tpu.utils.hf_convert import convert_alpro

    cfg = AlproConfig(
        video=vcfg,
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        embed_dim=16,
    )
    sd = {k: v.detach() for k, v in model.state_dict().items()}
    # converter expects visual_encoder.model.* — the state dict has it
    params = convert_alpro(sd, cfg, variant="retrieval")
    losses = alpro.retrieval_train_step(
        params, cfg, jax.random.PRNGKey(0),
        jnp.asarray(video.numpy()), jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(float(losses["loss_vtc"]), want_vtc, atol=3e-4, rtol=1e-3)
    assert np.isfinite(float(losses["loss_vtm"]))


def test_blip_pretrain_itc_and_lm_match_reference(ref_albef_retrieval):
    """BLIP pretraining oracle: deterministic ITC and captioning-LM losses
    vs the real BlipPretrain class — in particular the LM term's
    label-smoothed token-mean (CrossEntropyLoss(reduction='mean'),
    med.py:1238), the semantics a review fix pinned down."""
    _, med, vit = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    _ensure_blip_chain()
    pre_mod = _load("ref_blip_pretrain", ROOT + "blip_models/blip_pretrain.py")

    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = True
    bcfg.add_cross_attention = True
    torch.manual_seed(8)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    import copy as _copy

    dec_cfg = _copy.deepcopy(bcfg)
    dec_cfg.is_decoder = True
    text_dec = med.XBertLMHeadDecoder(config=dec_cfg)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D

    class _Tok:
        enc_token_id = 1
        bos_token_id = 2
        pad_token_id = 0

        def __len__(self):
            return V

        def __call__(self, caption, **k):
            return _FakeBatch(self._ids, self._mask)

    tok = _Tok()
    pre_mod.BlipPretrain.init_tokenizer = classmethod(lambda cls: tok)
    model = pre_mod.BlipPretrain(
        image_encoder=img_enc, text_encoder=text_enc, text_decoder=text_dec,
        queue_size=16, alpha=0.4, embed_dim=16, momentum=0.995,
        tie_enc_dec_weights=False, max_txt_len=8,
    ).eval()

    rng = np.random.default_rng(9)
    b, s = 4, 6
    ids_np = rng.integers(3, V, (b, s))
    ids_np[2, 4:] = 0  # variable lengths exercise the token-mean semantics
    ids = torch.tensor(ids_np)
    mask = torch.tensor((ids_np != 0).astype(np.int64))
    tok._ids, tok._mask = ids, mask
    imgs = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    q_img0 = model.image_queue.clone().numpy()
    q_txt0 = model.text_queue.clone().numpy()

    with torch.no_grad():
        out = model({
            "image": imgs, "text_input": ["x"] * b,
            "epoch": 10, "iters": 0, "num_iters_per_epoch": 1,
        })
    want_itc = float(out.loss_itc)
    want_lm = float(out.loss_lm)

    from llava_align_tpu.models import blip_variants as bv
    from llava_align_tpu.models.blip import BlipConfig
    from llava_align_tpu.utils.hf_convert import convert_blip_variant

    cfg = BlipConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=4.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
            use_type_embeddings=False,
        ),
        embed_dim=16,
    )
    params = convert_blip_variant(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg, "pretrain"
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    state = {
        "image_queue": jnp.asarray(q_img0),
        "text_queue": jnp.asarray(q_txt0),
        "idx_queue": jnp.full((1, 16), -100, jnp.int32),
        "ptr": jnp.zeros((), jnp.int32),
    }
    jids = jnp.asarray(ids_np)
    losses, _, _ = bv.pretrain_step(
        params, m_params, state, cfg, jax.random.PRNGKey(0),
        jnp.asarray(imgs.numpy()), jids, jids.at[:, 0].set(1),
        jids.at[:, 0].set(2), jnp.asarray((ids_np != 0).astype(np.int64)),
        jnp.arange(b),  # unique ids → diagonal targets like the reference
        alpha=0.4, momentum=0.995,
    )
    np.testing.assert_allclose(float(losses["loss_itc"]), want_itc, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(float(losses["loss_lm"]), want_lm, atol=3e-4, rtol=1e-3)


def test_albef_vqa_train_loss_and_predict_match_reference(ref_albef_retrieval):
    """ALBEF VQA oracle: the real AlbefVQA class's training loss (weighted
    label-smoothed answer LM + momentum distillation) and its deterministic
    predict_answers must both match."""
    _, med, vit = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    vqa_mod = _load("ref_albef_vqa", ROOT + "albef_models/albef_vqa.py")

    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = False
    bcfg.add_cross_attention = True
    import copy as _copy

    dec_cfg = _copy.deepcopy(bcfg)
    dec_cfg.fusion_layer = 0
    dec_cfg.num_hidden_layers = 2
    dec_cfg.is_decoder = True
    torch.manual_seed(11)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    text_dec = med.BertLMHeadModel(config=dec_cfg)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D

    rng = np.random.default_rng(12)
    nq, sq = 2, 5
    q_np = rng.integers(3, V, (nq, sq))
    q_mask_np = np.ones((nq, sq), np.int64)
    na_total, sa = 3, 4
    ans_np = np.zeros((na_total, sa), np.int64)
    ans_np[:, 0] = 2
    ans_np[0, 1:3] = [7, 9]
    ans_np[1, 1:4] = [11, 13, 15]
    ans_np[2, 1:2] = [21]
    ans_mask_np = (ans_np != 0).astype(np.int64)
    n_answers = [2, 1]
    weights_np = np.asarray([0.5, 0.5, 1.0], np.float32)

    calls = {"n": 0}

    class _Tok:
        pad_token_id = 0

        def __call__(self, texts, **k):
            # first call tokenizes questions, second the answers
            calls["n"] += 1
            if calls["n"] % 2 == 1:
                return _FakeBatch(torch.tensor(q_np), torch.tensor(q_mask_np))
            return _FakeBatch(torch.tensor(ans_np), torch.tensor(ans_mask_np))

    vqa_mod.AlbefVQA.init_tokenizer = classmethod(lambda cls: _Tok())
    model = vqa_mod.AlbefVQA(
        image_encoder=img_enc, text_encoder=text_enc, text_decoder=text_dec,
        use_distill=True, momentum=0.995, alpha=0.4, max_txt_len=8,
    ).eval()

    imgs = torch.tensor(rng.normal(size=(nq, 3, 32, 32)).astype(np.float32))
    with torch.no_grad():
        out = model({
            "image": imgs, "text_input": ["q"] * nq,
            "answer": ["a"] * na_total,
            "weight": torch.tensor(weights_np),
            "n_answers": torch.tensor(n_answers),
            "epoch": 5, "iters": 0, "num_iters_per_epoch": 1,
        })
    want_loss = float(out.loss)

    # --- ours ---
    from llava_align_tpu.models.albef import vqa_train_loss

    cfg = AlbefConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=2.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        decoder=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=0,
        ),
        embed_dim=16,
    )
    params = convert_albef(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg, variant="vqa"
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    got = vqa_train_loss(
        params, cfg, jnp.asarray(imgs.numpy()), jnp.asarray(q_np),
        jnp.asarray(q_mask_np), jnp.asarray(ans_np), jnp.asarray(ans_mask_np),
        n_answers, jnp.asarray(weights_np), m_params=m_params, alpha=0.4,
    )
    np.testing.assert_allclose(float(got), want_loss, atol=3e-4, rtol=1e-3)

    # --- deterministic predict_answers (rank over a fixed answer list) ---
    answer_list = [f"ans{i}" for i in range(6)]
    full_ans = np.zeros((6, sa), np.int64)
    full_ans[:, 0] = 2
    full_ans[:, 1] = rng.integers(3, V, 6)
    full_ans[:2, 2] = rng.integers(3, V, 2)
    full_mask = (full_ans != 0).astype(np.int64)

    class _Tok2(_Tok):
        def __call__(self, texts, **k):
            if isinstance(texts, list) and len(texts) == 6:
                return _FakeBatch(torch.tensor(full_ans), torch.tensor(full_mask))
            return _FakeBatch(torch.tensor(q_np), torch.tensor(q_mask_np))

    model.tokenizer = _Tok2()
    with torch.no_grad():
        preds = model.predict_answers(
            {"image": imgs, "text_input": ["q"] * nq},
            answer_list=answer_list, num_ans_candidates=4,
        )
    want_idx = [answer_list.index(p) for p in preds]

    got_idx = albef.rank_answers(
        params, cfg, jnp.asarray(imgs.numpy()), jnp.asarray(q_np),
        jnp.asarray(q_mask_np), jnp.asarray(full_ans), jnp.asarray(full_mask),
        num_ans_candidates=4,
    )
    assert list(got_idx) == want_idx


def test_blip_vqa_rank_matches_reference(ref_albef_retrieval):
    """BLIP VQA oracle: deterministic answer ranking vs the real BlipVQA
    class (multimodal question encoder + [BOS]-led answer decoder)."""
    _, med, vit = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    _ensure_blip_chain()
    vqa_mod = _load("ref_blip_vqa", ROOT + "blip_models/blip_vqa.py")

    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = True
    bcfg.add_cross_attention = True
    import copy as _copy

    dec_cfg = _copy.deepcopy(bcfg)
    dec_cfg.is_decoder = True
    torch.manual_seed(13)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    text_dec = med.XBertLMHeadDecoder(config=dec_cfg)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D

    rng = np.random.default_rng(14)
    nq, sq, na, sa = 2, 5, 6, 4
    q_np = rng.integers(3, V, (nq, sq))
    q_mask_np = np.ones((nq, sq), np.int64)
    ans_np = np.zeros((na, sa), np.int64)
    ans_np[:, 0] = 2  # bos (the class overwrites position 0 with bos anyway)
    ans_np[:, 1] = rng.integers(3, V, na)
    ans_np[:3, 2] = rng.integers(3, V, 3)
    ans_mask_np = (ans_np != 0).astype(np.int64)

    class _Tok:
        pad_token_id = 0
        bos_token_id = 2
        enc_token_id = 1  # forward_encoder overwrites question position 0

        def __call__(self, texts, **k):
            if isinstance(texts, list) and len(texts) == na:
                return _FakeBatch(torch.tensor(ans_np.copy()), torch.tensor(ans_mask_np))
            return _FakeBatch(torch.tensor(q_np.copy()), torch.tensor(q_mask_np))

    vqa_mod.BlipVQA.init_tokenizer = classmethod(lambda cls: _Tok())
    model = vqa_mod.BlipVQA(
        image_encoder=img_enc, text_encoder=text_enc, text_decoder=text_dec,
        max_txt_len=8,
    ).eval()

    imgs = torch.tensor(rng.normal(size=(nq, 3, 32, 32)).astype(np.float32))
    answer_list = [f"a{i}" for i in range(na)]
    with torch.no_grad():
        preds = model.predict_answers(
            {"image": imgs, "text_input": ["q"] * nq},
            answer_list=answer_list, inference_method="rank",
            num_ans_candidates=4,
        )
    want_idx = [answer_list.index(p) for p in preds]

    from llava_align_tpu.models import blip_variants as bv
    from llava_align_tpu.models.blip import BlipConfig
    from llava_align_tpu.utils.hf_convert import convert_blip_variant

    cfg = BlipConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=4.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
            use_type_embeddings=False,
        ),
        embed_dim=16,
    )
    params = convert_blip_variant(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg, "vqa"
    )
    # blip_vqa.py:113 leads the question with [ENC] before the multimodal
    # pass — our API takes the already-[ENC]-led ids
    enc_q = jnp.asarray(q_np).at[:, 0].set(1)
    got_idx = bv.vqa_rank_answers(
        params, cfg, jnp.asarray(imgs.numpy()), enc_q,
        jnp.asarray(q_mask_np), jnp.asarray(ans_np), jnp.asarray(ans_mask_np),
        num_ans_candidates=4,
    )
    assert list(got_idx) == want_idx


def test_albef_classification_loss_matches_reference(ref_albef_retrieval):
    """ALBEF classification oracle: CE + momentum distillation loss vs the
    real AlbefClassification class."""
    _, med, vit = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    cls_mod = _load("ref_albef_classification",
                    ROOT + "albef_models/albef_classification.py")

    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = False
    bcfg.add_cross_attention = True
    torch.manual_seed(15)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D

    rng = np.random.default_rng(16)
    b, s = 3, 5
    ids_np = rng.integers(3, V, (b, s))
    mask_np = np.ones((b, s), np.int64)

    class _Tok:
        def __call__(self, texts, **k):
            return _FakeBatch(torch.tensor(ids_np), torch.tensor(mask_np))

    cls_mod.AlbefClassification.init_tokenizer = classmethod(lambda cls: _Tok())
    model = cls_mod.AlbefClassification(
        image_encoder=img_enc, text_encoder=text_enc, num_classes=3,
        momentum=0.995, alpha=0.4, use_distill=True, max_txt_len=8,
    ).eval()
    imgs = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    targets = torch.tensor([0, 2, 1])
    with torch.no_grad():
        out = model({
            "image": imgs, "text_input": ["x"] * b, "label": targets,
            "epoch": 5, "iters": 0, "num_iters_per_epoch": 1,
        })
    want = float(out.loss)

    cfg = AlbefConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=2.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        embed_dim=16, num_classes=3,
    )
    params = convert_albef(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg,
        variant="classification",
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    got, _ = albef.classification_loss(
        params, cfg, jnp.asarray(imgs.numpy()), jnp.asarray(ids_np),
        jnp.asarray(mask_np), jnp.asarray(targets.numpy()),
        m_params=m_params, alpha=0.4,
    )
    np.testing.assert_allclose(float(got), want, atol=3e-4, rtol=1e-3)


def test_albef_nlvr_loss_matches_reference(ref_albef_retrieval):
    """ALBEF NLVR2 oracle: the real AlbefNLVR class with its genuine
    18-layer encoder (6 text + 12 alternating fusion layers with
    share_cross_attention KV tying) vs our alternating list-encoder path
    — CE + momentum-distillation loss and raw predictions."""
    _, med, vit = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    nlvr_mod = _load("ref_albef_nlvr", ROOT + "albef_models/albef_nlvr.py")

    from transformers.models.bert.configuration_bert import BertConfig

    L = 18  # albef_nlvr.py:232 and share_cross_attention's hardcoded pairs
    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 6
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = False
    bcfg.add_cross_attention = True
    torch.manual_seed(17)
    text_enc = med.BertModel(config=bcfg, add_pooling_layer=False)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D

    rng = np.random.default_rng(18)
    b, s = 2, 5
    ids_np = rng.integers(3, V, (b, s))
    mask_np = np.ones((b, s), np.int64)

    class _Tok:
        def __call__(self, texts, **k):
            return _FakeBatch(torch.tensor(ids_np), torch.tensor(mask_np))

    nlvr_mod.AlbefNLVR.init_tokenizer = classmethod(lambda cls: _Tok())
    model = nlvr_mod.AlbefNLVR(
        image_encoder=img_enc, text_encoder=text_enc, num_classes=2,
        momentum=0.995, alpha=0.4, use_distill=True, max_txt_len=8,
    ).eval()

    img0 = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    img1 = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    targets = torch.tensor([1, 0])
    with torch.no_grad():
        out = model({
            "image0": img0, "image1": img1, "text_input": ["x"] * b,
            "label": targets, "epoch": 5, "iters": 0, "num_iters_per_epoch": 1,
        })
    want_loss = float(out.loss)

    cfg = AlbefConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=2.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=L, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=6,
        ),
        embed_dim=16, num_classes=2,
    )
    params = convert_albef(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg,
        variant="nlvr",
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    got, logits = albef.nlvr_loss(
        params, cfg, jnp.asarray(img0.numpy()), jnp.asarray(img1.numpy()),
        jnp.asarray(ids_np), jnp.asarray(mask_np), jnp.asarray(targets.numpy()),
        m_params=m_params, alpha=0.4,
    )
    np.testing.assert_allclose(float(got), want_loss, atol=3e-4, rtol=1e-3)
    with torch.no_grad():
        preds = model({"image0": img0, "image1": img1, "text_input": ["x"] * b,
                       "label": targets}, is_train=False)
    np.testing.assert_allclose(
        np.asarray(logits), preds["predictions"].numpy(), atol=3e-4, rtol=1e-3
    )


def test_alpro_qa_loss_matches_reference(ref_albef_retrieval):
    """ALPRO video-QA oracle: CE over the concat-fusion classifier vs the
    real AlproQA class."""
    _, med, _ = ref_albef_retrieval
    ROOT = "/root/reference/experiments/lavis/models/"
    _ensure_timesformer_pkg()
    if "lavis.models.alpro_models" not in sys.modules:
        _load("lavis.models.alpro_models", ROOT + "alpro_models/__init__.py")
        _load("lavis.models.alpro_models.alpro_outputs",
              ROOT + "alpro_models/alpro_outputs.py")
    import importlib as _il

    tsf_vit = _il.import_module("lavis.models.timesformer.vit")
    qa_mod = _load("ref_alpro_qa", ROOT + "alpro_models/alpro_qa.py")

    from transformers.models.bert.configuration_bert import BertConfig

    from llava_align_tpu.models.timesformer import TimeSformerConfig

    vcfg = TimeSformerConfig.tiny()
    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = True
    bcfg.add_cross_attention = False
    torch.manual_seed(19)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    ts = tsf_vit.TimeSformer(
        image_size=vcfg.image_size, patch_size=vcfg.patch_size,
        n_frms=vcfg.num_frames, attn_drop_rate=0.0, drop_path_rate=0.0,
        drop_rate=0.0,
    )
    ts.model = tsf_vit.VisionTransformer(
        img_size=vcfg.image_size, patch_size=vcfg.patch_size,
        embed_dim=D, depth=vcfg.num_layers, num_heads=vcfg.num_heads,
        mlp_ratio=vcfg.mlp_ratio, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
        num_frames=vcfg.num_frames, attention_type="divided_space_time",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    with torch.no_grad():
        ts.model.pos_embed.normal_(0, 0.02)
        ts.model.time_embed.normal_(0, 0.02)
        ts.model.cls_token.normal_(0, 0.02)
        for n, p_ in ts.model.named_parameters():
            if "temporal_fc" in n or "bias" in n:
                p_.normal_(0, 0.02)
    ts.num_frames = vcfg.num_frames
    ts.img_size = vcfg.image_size

    rng = np.random.default_rng(20)
    b, s, T = 2, 5, vcfg.num_frames
    ids_np = rng.integers(3, V, (b, s))
    mask_np = np.ones((b, s), np.int64)

    class _Tok:
        def __call__(self, texts, **k):
            return _FakeBatch(torch.tensor(ids_np), torch.tensor(mask_np))

    qa_mod.AlproQA.init_tokenizer = classmethod(lambda cls: _Tok())
    model = qa_mod.AlproQA(
        visual_encoder=ts, text_encoder=text_enc, hidden_size=D, num_classes=3,
        max_txt_len=8,
    ).eval()

    video = torch.tensor(
        rng.normal(size=(b, 3, T, vcfg.image_size, vcfg.image_size)).astype(np.float32)
    )
    targets = torch.tensor([0, 2])
    with torch.no_grad():
        out = model({"video": video, "text_input": ["q"] * b, "answers": targets})
    want_loss = float(out.loss)

    from llava_align_tpu.models import alpro
    from llava_align_tpu.models.alpro import AlproConfig
    from llava_align_tpu.utils.hf_convert import convert_alpro

    cfg = AlproConfig(
        video=vcfg,
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        embed_dim=16, num_classes=3,
    )
    params = convert_alpro(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg, variant="qa"
    )
    got, logits = alpro.qa_loss(
        params, cfg, jnp.asarray(video.numpy()), jnp.asarray(ids_np),
        jnp.asarray(mask_np), jnp.asarray(targets.numpy()),
    )
    np.testing.assert_allclose(float(got), want_loss, atol=3e-4, rtol=1e-3)
    with torch.no_grad():
        preds = model({"video": video, "text_input": ["q"] * b,
                       "answers": targets}, is_train=False)
    np.testing.assert_allclose(
        np.asarray(logits), preds["predictions"].numpy(), atol=3e-4, rtol=1e-3
    )


def test_albef_compute_sim_matrix_matches_reference(ref_albef_retrieval):
    """Full retrieval-eval oracle: the reference compute_sim_matrix loop
    (albef_models/__init__.py:76-202 — ITC sims, top-k_test ITM re-rank in
    both directions, sim+itm scoring) vs our albef.compute_sim_matrix on
    the same converted weights."""
    ret_mod, med, vit = ref_albef_retrieval
    import lavis.models.albef_models as albef_pkg

    from transformers.models.bert.configuration_bert import BertConfig

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = False
    bcfg.add_cross_attention = True
    torch.manual_seed(21)
    text_enc = med.XBertEncoder(config=bcfg, add_pooling_layer=False)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D
    ret_mod.AlbefRetrieval.init_tokenizer = classmethod(lambda cls: None)
    model = ret_mod.AlbefRetrieval(
        image_encoder=img_enc, text_encoder=text_enc, queue_size=16,
        embed_dim=16, temp=0.07, use_distill=True, momentum=0.995, alpha=0.4,
        max_txt_len=8,
    ).eval()

    rng = np.random.default_rng(22)
    ni, nt, s = 3, 4, 6
    text_ids = rng.integers(3, V, (nt, s))
    text_mask = np.ones((nt, s), np.int64)
    pixels = rng.normal(size=(ni, 3, 32, 32)).astype(np.float32)
    k_test = 2

    class _Tok:
        def __call__(self, texts, **k):
            lo = _Tok.cursor
            hi = lo + len(texts)
            _Tok.cursor = hi
            return _FakeBatch(
                torch.tensor(text_ids[lo:hi]), torch.tensor(text_mask[lo:hi])
            )

    _Tok.cursor = 0
    model.tokenizer = _Tok()

    class _DS:
        text = [f"t{i}" for i in range(nt)]
        image = [f"i{i}" for i in range(ni)]

    class _Loader:
        dataset = _DS()

        def __iter__(self):
            return iter([{"image": torch.tensor(pixels)}])

    with torch.no_grad():
        want_i2t, want_t2i = albef_pkg.compute_sim_matrix(
            model, _Loader(), k_test=k_test
        )

    cfg = AlbefConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=2.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        embed_dim=16,
    )
    params = convert_albef(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg,
        variant="retrieval",
    )
    got_i2t, got_t2i = albef.compute_sim_matrix(
        params, cfg, jnp.asarray(pixels), jnp.asarray(text_ids),
        jnp.asarray(text_mask), k_test=k_test,
    )
    # re-ranked entries carry sim+itm scores; untouched entries are -100
    np.testing.assert_allclose(got_i2t, want_i2t, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(got_t2i, want_t2i, atol=3e-4, rtol=1e-3)


def test_albef_pretrain_losses_match_reference(ref_albef_retrieval):
    """AlbefPretrain forward (albef_pretrain.py:105-324) head-to-head: ITC
    (queue + momentum-distilled diagonal targets), ITM (hard negatives pinned
    by patching torch.multinomial), and masked-LM with momentum distillation
    (fixed corruption via the class's own mask hook)."""
    ret_mod, med, vit = ref_albef_retrieval
    from functools import partial

    import torch.nn as nn
    from transformers.models.bert.configuration_bert import BertConfig

    ROOT = "/root/reference/experiments/lavis/models/"
    # albef_pretrain.py uses np.Inf, removed in NumPy 2.0 — restore the alias
    # for the read-only reference module (module attr beats __getattr__)
    np.Inf = np.inf
    pre_mod = _load("ref_albef_pretrain", ROOT + "albef_models/albef_pretrain.py")

    bcfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    bcfg.fusion_layer = 2
    bcfg.encoder_width = D
    bcfg.add_type_embeddings = False
    bcfg.add_cross_attention = True
    torch.manual_seed(3)
    text_enc = med.BertForMaskedLM(config=bcfg)
    img_enc = vit.VisionTransformerEncoder(
        img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    img_enc.vision_width = D
    pre_mod.AlbefPretrain.init_tokenizer = classmethod(lambda cls: None)
    model = pre_mod.AlbefPretrain(
        image_encoder=img_enc, text_encoder=text_enc, queue_size=16,
        embed_dim=16, mlm_mask_prob=0.15, temp=0.07, momentum=0.995,
        alpha=0.4, max_txt_len=8,
    ).eval()

    rng = np.random.default_rng(7)
    b, s = 4, 6
    ids = torch.tensor(rng.integers(3, V, (b, s)))
    mask = torch.ones((b, s), dtype=torch.long)
    model.tokenizer = lambda caption, **k: _FakeBatch(ids, mask)

    # deterministic MLM corruption through the class's own mask() hook
    mlm_inputs = ids.clone()
    mlm_inputs[:, 2] = 5  # pretend-[MASK]
    mlm_labels = torch.full_like(ids, -100)
    mlm_labels[:, 2] = ids[:, 2]
    mlm_labels[0, 4] = ids[0, 4]  # a kept-token target
    model.mask = (
        lambda input_ids, vocab_size, device, targets=None,
        masked_indices=None, probability_matrix=None:
        (mlm_inputs.clone(), mlm_labels.clone())
    )

    imgs = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    q_img0 = model.image_queue.clone().numpy()
    q_txt0 = model.text_queue.clone().numpy()

    # pin the hard-negative multinomial draws: t2i (image negs) then i2t
    neg_img = [1, 2, 3, 0]
    neg_txt = [2, 3, 0, 1]
    draws = iter(neg_img + neg_txt)
    orig_multinomial = torch.multinomial
    torch.multinomial = lambda w, n, **k: torch.tensor([next(draws)])
    try:
        with torch.no_grad():
            out = model({
                "image": imgs, "text_input": ["x"] * b,
                "epoch": 5, "iters": 0, "num_iters_per_epoch": 1,
            })
    finally:
        torch.multinomial = orig_multinomial
    want = {
        "loss_itc": float(out.loss_itc), "loss_itm": float(out.loss_itm),
        "loss_mlm": float(out.loss_mlm),
    }
    want_q_img = model.image_queue.clone().numpy()
    want_ptr = int(model.queue_ptr)

    cfg = AlbefConfig(
        vision=BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=D, num_layers=2,
            num_heads=4, mlp_ratio=2.0,
        ),
        text=MedConfig(
            vocab_size=V, hidden_size=D, num_layers=4, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
        ),
        embed_dim=16, queue_size=16,
    )
    params = convert_albef(
        {k: v.detach() for k, v in model.state_dict().items()}, cfg,
        variant="pretrain",
    )
    m_params = jax.tree_util.tree_map(jnp.copy, params)
    state = {
        "image_queue": jnp.asarray(q_img0),
        "text_queue": jnp.asarray(q_txt0),
        "ptr": jnp.zeros((), jnp.int32),
    }
    alpha = 0.4 * albef.rampup_factor(5, 0, 1)
    losses, _, new_state = albef.pretrain_train_step(
        params, m_params, state, cfg, jax.random.PRNGKey(0),
        jnp.asarray(imgs.numpy()), jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()),
        alpha=alpha,
        mlm_inputs=jnp.asarray(mlm_inputs.numpy()),
        mlm_labels=jnp.asarray(mlm_labels.numpy()),
        neg_idx=(jnp.asarray(neg_img), jnp.asarray(neg_txt)),
    )
    for k, v in want.items():
        np.testing.assert_allclose(float(losses[k]), v, atol=3e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["image_queue"]), want_q_img, atol=2e-4, rtol=1e-3
    )
    assert int(new_state["ptr"]) == want_ptr
