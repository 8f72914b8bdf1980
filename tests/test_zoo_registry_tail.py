"""Registry front-door completeness: every model/task/processor/runner name
the reference registers resolves here, and the round-5 zoo tail (stage-1
BLIP-2, BLIP-2 LM backends, albef_pretrain, pnp_unifiedqav2_fid) builds and
runs offline at tiny dims."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_align_tpu.framework import model_zoo  # noqa: F401 — registrations
from llava_align_tpu.framework import runner  # noqa: F401
from llava_align_tpu.framework.registry import registry

# grep -rho 'register_model("..."' over /root/reference/experiments/lavis/models/
REFERENCE_MODELS = """albef_classification albef_feature_extractor albef_nlvr
albef_pretrain albef_retrieval albef_vqa alpro_qa alpro_retrieval blip2
blip2_feature_extractor blip2_image_text_matching blip2_opt blip2_t5
blip2_t5_instruct blip2_vicuna_instruct blip_caption blip_classification
blip_diffusion blip_feature_extractor blip_image_text_matching blip_nlvr
blip_pretrain blip_retrieval blip_vqa clip clip_feature_extractor
gpt_dialogue img2prompt_vqa pnp_unifiedqav2_fid pnp_vqa""".split()


def test_every_reference_model_name_registered():
    mine = set(registry.list("model"))
    missing = sorted(set(REFERENCE_MODELS) - mine)
    assert not missing, f"unregistered reference model names: {missing}"


def test_runner_iter_registered():
    assert registry.get_runner_class("runner_iter") is registry.get_runner_class("runner_base")


def test_blip2_stage1_zoo_smoke():
    m = registry.get_model_class("blip2")()
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 100, (2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)
    losses = m.forward(
        imgs, ids, mask, bos_token_id=1, pad_token_id=0, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(losses["loss"]))
    caps = m.generate(imgs, bos_token_id=1, eos_token_id=10**6, max_new_tokens=3)
    assert caps.shape == (2, 3)
    feats = m.extract_features(images=imgs, mode="image")
    assert feats["image_embeds_proj"].shape[0] == 2


def test_blip2_itm_zoo_smoke():
    m = registry.get_model_class("blip2_image_text_matching")()
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(5, 100, (2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)
    itm = m.forward(imgs, ids, mask, match_head="itm")
    itc = m.forward(imgs, ids, mask, match_head="itc")
    assert itm.shape == (2, 2) and itc.shape == (2,)


def test_blip2_t5_zoo_smoke():
    m = registry.get_model_class("blip2_t5")()
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28), jnp.float32)
    outs = m.predict_answers(imgs, [[5, 6], [7, 8, 9]], max_new_tokens=3)
    assert len(outs) == 2
    loss = m.forward(
        imgs,
        jnp.asarray([[5, 6, 7], [8, 9, 0]]), jnp.asarray([[1, 1, 1], [1, 1, 0]]),
        jnp.asarray([[4, 5], [6, 0]]), jnp.asarray([[1, 1], [1, 0]]),
    )
    assert np.isfinite(float(loss))


def test_blip2_t5_instruct_predict_class():
    m = registry.get_model_class("blip2_t5_instruct")()
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28), jnp.float32)
    in_ids = jnp.asarray([[5, 6, 7], [8, 9, 0]])
    in_mask = jnp.asarray([[1, 1, 1], [1, 1, 0]])
    cand = jnp.asarray(np.random.default_rng(2).integers(3, 100, (3, 4)))
    ranks = m.predict_class(
        imgs, in_ids, in_mask, cand,
        qformer_text_ids=in_ids, qformer_text_mask=in_mask,
    )
    assert ranks.shape == (2, 3)
    assert sorted(ranks[0].tolist()) == [0, 1, 2]


def test_blip2_opt_zoo_smoke():
    m = registry.get_model_class("blip2_opt")()
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(4, 200, (2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)
    loss = m.forward(imgs, ids, mask, pad_token_id=1)
    assert np.isfinite(float(loss))
    with pytest.raises(NotImplementedError):
        m.generate(imgs, [[2, 3]])


def test_albef_pretrain_zoo_smoke():
    from llava_align_tpu.models import albef as albef_mod

    m = registry.get_model_class("albef_pretrain")()
    state = albef_mod.init_queue_state(m.cfg, jax.random.PRNGKey(2))
    m_params = jax.tree_util.tree_map(jnp.copy, m.params)
    sz = m.cfg.vision.image_size
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, sz, sz), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(4).integers(3, 60, (2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)
    losses, _, new_state = m.train_step(
        m_params, state, jax.random.PRNGKey(1), imgs, ids, mask,
        alpha=0.4, mask_token_id=2, pad_token_id=0, cls_token_id=1,
    )
    for k in ("loss", "loss_itc", "loss_itm", "loss_mlm"):
        assert np.isfinite(float(losses[k])), k
    assert int(new_state["ptr"]) == 2


def test_pnp_unifiedqav2_fid_zoo_smoke():
    m = registry.get_model_class("pnp_unifiedqav2_fid")()
    ctx = jnp.asarray(np.random.default_rng(5).integers(3, 100, (3, 7)))
    mask = jnp.ones((3, 7), jnp.int32)
    out = m.generate(ctx, mask, max_len=4)
    assert isinstance(out, list) and len(out) <= 4


def test_load_model_and_preprocess_front_door():
    """reference lavis/models/__init__.py front door: model + per-family
    default processors + the model_zoo listing."""
    from PIL import Image

    model, vis, txt = model_zoo.load_model_and_preprocess("blip_caption")
    assert model.arch == "blip_caption"
    img = Image.fromarray(np.zeros((40, 40, 3), np.uint8))
    arr = vis["eval"](img)
    assert arr.shape[0] == 3 and arr.shape[1] == arr.shape[2]
    assert txt["eval"]("A Dog!") == "a dog"

    m2, vis2, txt2 = model_zoo.load_model_and_preprocess("clip")
    assert vis2["train"] is not None and txt2["eval"]("KeepCase") == "KeepCase"

    zoo = model_zoo.model_zoo
    assert len(zoo) >= 30
    assert "blip2_t5_instruct" in str(zoo)


def test_load_preprocess_explicit_config():
    vis, txt = model_zoo.load_preprocess({
        "vis_processor": {"eval": {"name": "blip_image_eval", "image_size": 32}},
        "text_processor": {"eval": {"name": "blip_caption", "prompt": "a photo of "}},
    })
    from PIL import Image

    out = vis["eval"](Image.fromarray(np.zeros((48, 48, 3), np.uint8)))
    assert out.shape == (3, 32, 32)
    assert txt["eval"]("Cat.") == "a photo of cat"
