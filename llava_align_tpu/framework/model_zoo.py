"""Registry-assembled model zoo.

Capability parity: LAVIS registers every model class with
`@registry.register_model(arch)` so tasks/configs assemble models by name
(reference lavis/models/__init__.py + registry.py); this module does the
same for every family this framework ships. Each entry is a thin factory
carrying (params, cfg) plus the family's generate/encode entry points —
`BaseTask.build_model({"arch": ...})` resolves them.

`model_path=None` (or "random[:tiny]") builds a random-weight instance at
tiny or preset dims — the offline smoke configuration used across tests.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from llava_align_tpu.framework.registry import registry


class _ZooModel:
    arch: str = "base"

    def __init__(self, params, cfg):
        self.params = params
        self.cfg = cfg


@registry.register_model("llava")
class LlavaModel(_ZooModel):
    """LLaVA-v1.5 (reference llava_llama.py capability)."""

    arch = "llava"

    def __init__(self, model_path: Optional[str] = None, size: str = "tiny", **kw):
        from llava_align_tpu.config import LlavaConfig
        from llava_align_tpu.models import llava

        if model_path and not model_path.startswith("random"):
            from llava_align_tpu.utils.hf_convert import load_llava_checkpoint

            params, cfg = load_llava_checkpoint(model_path)
        else:
            cfg = {
                "tiny": LlavaConfig.tiny,
                "7b": LlavaConfig.llava_v15_7b,
                "13b": LlavaConfig.llava_v15_13b,
            }[size]()
            params = llava.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def make_engine(self, gen, **kw):
        from llava_align_tpu.decoding.engine import DecodeEngine

        return DecodeEngine(self.params, self.cfg, gen, **kw)


@registry.register_model("llava_mpt")
class LlavaMptModel(_ZooModel):
    arch = "llava_mpt"

    def __init__(self, model_path: Optional[str] = None, **kw):
        from llava_align_tpu.models import llava_mpt

        cfg = llava_mpt.LlavaMptConfig.tiny()
        params = llava_mpt.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def make_engine(self, gen, **kw):
        from llava_align_tpu.decoding.adapters import LlavaMptAdapter
        from llava_align_tpu.decoding.engine import DecodeEngine

        return DecodeEngine(self.params, self.cfg, gen, adapter=LlavaMptAdapter(self.cfg), **kw)


@registry.register_model("qwen_vl")
class QwenVLModel(_ZooModel):
    arch = "qwen_vl"

    def __init__(self, model_path: Optional[str] = None, **kw):
        from llava_align_tpu.models import qwen_vl

        if model_path and not model_path.startswith("random"):
            from llava_align_tpu.utils.hf_convert import load_qwen_vl_checkpoint

            params, cfg = load_qwen_vl_checkpoint(model_path)
        else:
            cfg = qwen_vl.QwenVLConfig.tiny()
            params = qwen_vl.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def make_engine(self, gen, **kw):
        from llava_align_tpu.decoding.adapters import QwenVLAdapter
        from llava_align_tpu.decoding.engine import DecodeEngine

        return DecodeEngine(self.params, self.cfg, gen, adapter=QwenVLAdapter(self.cfg), **kw)


@registry.register_model("blip2_vicuna_instruct")
class InstructBlipModel(_ZooModel):
    arch = "blip2_vicuna_instruct"

    def __init__(self, model_path: Optional[str] = None, **kw):
        from llava_align_tpu.models import instructblip

        if model_path and not model_path.startswith("random"):
            from llava_align_tpu.utils.hf_convert import (
                convert_instructblip,
                load_state_dict,
            )

            cfg = instructblip.InstructBlipConfig.vicuna7b()
            params = convert_instructblip(load_state_dict(model_path), cfg)
        else:
            cfg = instructblip.InstructBlipConfig.tiny()
            params = instructblip.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def make_engine(self, gen, **kw):
        from llava_align_tpu.decoding.adapters import InstructBlipAdapter
        from llava_align_tpu.decoding.engine import DecodeEngine

        return DecodeEngine(self.params, self.cfg, gen, adapter=InstructBlipAdapter(self.cfg), **kw)


def _blip_factory(arch_name):
    @registry.register_model(arch_name)
    class BlipModel(_ZooModel):
        arch = arch_name

        def __init__(self, model_path: Optional[str] = None, **kw):
            from llava_align_tpu.models import blip as blip_mod

            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.utils.hf_convert import convert_blip, load_state_dict

                cfg = blip_mod.BlipConfig()
                params = convert_blip(load_state_dict(model_path), cfg)
            else:
                cfg = blip_mod.BlipConfig.tiny()
                params = blip_mod.init(jax.random.PRNGKey(0), cfg)
            super().__init__(params, cfg)

        def generate(self, pixels, prompt_ids, **kw):
            from llava_align_tpu.models import blip as blip_mod

            return blip_mod.generate_caption(self.params, self.cfg, pixels, prompt_ids, **kw)

        def itm(self, pixels, text_ids, text_mask):
            from llava_align_tpu.models import blip as blip_mod

            return blip_mod.itm_score(self.params, self.cfg, pixels, text_ids, text_mask)

        def extract_features(self, **kw):
            from llava_align_tpu.models import blip as blip_mod

            return blip_mod.extract_features(self.params, self.cfg, **kw)

    BlipModel.__name__ = f"BlipModel_{arch_name}"
    return BlipModel


for _arch in ("blip_caption", "blip_image_text_matching", "blip_feature_extractor"):
    _blip_factory(_arch)

def _albef_factory(arch_name: str, variant: str):
    @registry.register_model(arch_name)
    class AlbefModel(_ZooModel):
        """ALBEF zoo entry (reference lavis/models/albef_models/*)."""

        arch = arch_name

        def __init__(self, model_path: Optional[str] = None,
                     num_classes: int = 0, **kw):
            from llava_align_tpu.models import albef as albef_mod

            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.models.blip import MedConfig
                from llava_align_tpu.utils.hf_convert import convert_albef, load_state_dict

                if variant == "nlvr":
                    # reference albef_nlvr.py:232: 18-layer encoder (6 text
                    # + 12 alternating fusion layers), fusion at 6
                    cfg = albef_mod.AlbefConfig(
                        text=MedConfig(
                            vocab_size=30522, num_layers=18, fusion_layer=6
                        ),
                        num_classes=num_classes,
                    )
                else:
                    cfg = albef_mod.AlbefConfig(num_classes=num_classes)
                params = convert_albef(load_state_dict(model_path), cfg, variant=variant)
            else:
                cfg = albef_mod.AlbefConfig.tiny(
                    num_classes=num_classes or (2 if variant in ("classification", "nlvr") else 0),
                    nlvr=variant == "nlvr",
                )
                params = albef_mod.init(jax.random.PRNGKey(0), cfg, variant=variant)
            self.variant = variant
            super().__init__(params, cfg)

        def predict_answers(self, pixels, q_ids, q_mask, answer_ids, answer_mask, **kw):
            from llava_align_tpu.models import albef as albef_mod

            return albef_mod.rank_answers(
                self.params, self.cfg, pixels, q_ids, q_mask, answer_ids,
                answer_mask, **kw,
            )

        def compute_sim_matrix(self, pixels, text_ids, text_mask, **kw):
            from llava_align_tpu.models import albef as albef_mod

            return albef_mod.compute_sim_matrix(
                self.params, self.cfg, pixels, text_ids, text_mask, **kw
            )

        def extract_features(self, **kw):
            from llava_align_tpu.models import albef as albef_mod

            return albef_mod.extract_features(self.params, self.cfg, **kw)

        def predict(self, *args):
            from llava_align_tpu.models import albef as albef_mod

            if self.variant == "nlvr":
                return albef_mod.nlvr_forward(self.params, self.cfg, *args)
            return albef_mod.classify(self.params, self.cfg, *args)

        def train_step(self, m_params, state, rng, pixels, ids, mask, **kw):
            from llava_align_tpu.models import albef as albef_mod

            fn = (
                albef_mod.pretrain_train_step if self.variant == "pretrain"
                else albef_mod.retrieval_train_step
            )
            return fn(self.params, m_params, state, self.cfg, rng, pixels, ids, mask, **kw)

    AlbefModel.__name__ = f"AlbefModel_{arch_name}"
    return AlbefModel


for _arch, _variant in (
    ("albef_retrieval", "retrieval"),
    ("albef_pretrain", "pretrain"),
    ("albef_vqa", "vqa"),
    ("albef_classification", "classification"),
    ("albef_nlvr", "nlvr"),
    ("albef_feature_extractor", "feature"),
):
    _albef_factory(_arch, _variant)


@registry.register_model("gpt_dialogue")
class GptDialogueModel(_ZooModel):
    """GPT-dialogue zoo entry (reference lavis/models/gpt_models/gpt_dialogue.py)."""

    arch = "gpt_dialogue"

    def __init__(self, model_path: Optional[str] = None, **kw):
        from llava_align_tpu.models import gpt2 as gpt2_mod

        if model_path and not model_path.startswith("random"):
            from llava_align_tpu.utils.hf_convert import convert_gpt_dialogue, load_state_dict

            cfg = gpt2_mod.GptDialogueConfig()
            params = convert_gpt_dialogue(load_state_dict(model_path), cfg)
        else:
            cfg = gpt2_mod.GptDialogueConfig.tiny()
            params = gpt2_mod.dialogue_init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def forward(self, **samples):
        from llava_align_tpu.models import gpt2 as gpt2_mod

        return gpt2_mod.dialogue_forward(self.params, self.cfg, **samples)

    def generate(self, input_ids, video_fts, **kw):
        from llava_align_tpu.models import gpt2 as gpt2_mod

        return gpt2_mod.dialogue_generate(self.params, self.cfg, input_ids, video_fts, **kw)


def _alpro_factory(arch_name: str, variant: str):
    @registry.register_model(arch_name)
    class AlproModel(_ZooModel):
        """ALPRO zoo entry (reference lavis/models/alpro_models/*)."""

        arch = arch_name

        def __init__(self, model_path: Optional[str] = None,
                     num_classes: int = 0, **kw):
            from llava_align_tpu.models import alpro as alpro_mod

            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.utils.hf_convert import convert_alpro, load_state_dict

                cfg = alpro_mod.AlproConfig(num_classes=num_classes)
                params = convert_alpro(load_state_dict(model_path), cfg, variant=variant)
            else:
                cfg = alpro_mod.AlproConfig.tiny(
                    num_classes=num_classes or (2 if variant == "qa" else 0)
                )
                params = alpro_mod.init(jax.random.PRNGKey(0), cfg, variant=variant)
            self.variant = variant
            super().__init__(params, cfg)

        def predict(self, video, ids, mask):
            from llava_align_tpu.models import alpro as alpro_mod

            return alpro_mod.qa_logits(self.params, self.cfg, video, ids, mask)

        def compute_sim_matrix(self, videos, text_ids, text_mask, **kw):
            from llava_align_tpu.models import alpro as alpro_mod

            return alpro_mod.compute_sim_matrix(
                self.params, self.cfg, videos, text_ids, text_mask, **kw
            )

    AlproModel.__name__ = f"AlproModel_{arch_name}"
    return AlproModel


for _arch, _variant in (("alpro_retrieval", "retrieval"), ("alpro_qa", "qa")):
    _alpro_factory(_arch, _variant)


def _clip_factory(arch_name: str):
    @registry.register_model(arch_name)
    class ClipModel(_ZooModel):
        """CLIP zoo entry (reference lavis/models/clip_models/model.py)."""

        arch = arch_name

        def __init__(self, model_path: Optional[str] = None, **kw):
            from llava_align_tpu.models import clip as clip_mod

            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.utils.hf_convert import (
                    convert_clip_full, convert_clip_openai, load_state_dict,
                )

                cfg = clip_mod.ClipConfig()
                sd = load_state_dict(model_path)
                if "visual.class_embedding" in sd:
                    params = convert_clip_openai(sd, cfg)
                else:
                    params = convert_clip_full(sd, cfg)
            else:
                cfg = clip_mod.ClipConfig.tiny()
                params = clip_mod.init(jax.random.PRNGKey(0), cfg)
            super().__init__(params, cfg)

        def encode_image(self, pixels):
            from llava_align_tpu.models import clip as clip_mod

            return clip_mod.encode_image(self.params, self.cfg, pixels)

        def encode_text(self, ids):
            from llava_align_tpu.models import clip as clip_mod

            return clip_mod.encode_text(self.params, self.cfg, ids)

        def extract_features(self, **kw):
            from llava_align_tpu.models import clip as clip_mod

            return clip_mod.extract_features(self.params, self.cfg, **kw)

        def zero_shot_classifier(self, classnames, templates, tokenize):
            from llava_align_tpu.models import clip as clip_mod

            return clip_mod.zero_shot_classifier(
                self.params, self.cfg, classnames, templates, tokenize
            )

        def predict(self, pixels, classifier):
            from llava_align_tpu.models import clip as clip_mod

            return clip_mod.zero_shot_predict(self.params, self.cfg, pixels, classifier)

        def compute_sim_matrix(self, pixels, text_ids, text_mask=None, **kw):
            # text_mask accepted for signature parity with the other
            # retrieval archs; CLIP pools at the EOT position and needs none
            from llava_align_tpu.models import clip as clip_mod

            return clip_mod.compute_sim_matrix(self.params, self.cfg, pixels, text_ids)

    ClipModel.__name__ = f"ClipModel_{arch_name}"
    return ClipModel


for _arch in ("clip", "clip_feature_extractor"):
    _clip_factory(_arch)


@registry.register_model("pnp_vqa")
class PnpVqaModel(_ZooModel):
    """PnP-VQA composite zoo entry (reference lavis/models/pnp_vqa_models/)."""

    arch = "pnp_vqa"

    def __init__(self, model_path: Optional[str] = None, *,
                 itm_path: Optional[str] = None, cap_path: Optional[str] = None,
                 qa_path: Optional[str] = None, block_num: int = 7, **kw):
        from llava_align_tpu.models import pnp_vqa as pnp_mod

        explicit = {k: v for k, v in
                    (("itm", itm_path), ("cap", cap_path), ("qa", qa_path)) if v}
        if (model_path and not model_path.startswith("random")) or len(explicit) == 3:
            # composite assembly (reference pnp_vqa.py from_config :321-338:
            # BLIP-ITM + BLIP-caption + UnifiedQAv2-T5 built from three
            # checkpoint configs through load_model_and_preprocess)
            from llava_align_tpu.utils.hf_convert import load_blip_t5_composite

            params, cfgs = load_blip_t5_composite(
                model_path or "", qa_key="qa", paths=explicit or None
            )
            cfg = pnp_mod.PnpVqaConfig(
                itm=cfgs["itm"], cap=cfgs["cap"], qa=cfgs["qa"],
                block_num=block_num,
            )
        else:
            cfg = pnp_mod.PnpVqaConfig.tiny()
            params = pnp_mod.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def predict_answers(self, *args, **kw):
        from llava_align_tpu.models import pnp_vqa as pnp_mod

        return pnp_mod.predict_answers(self.params, self.cfg, *args, **kw)


@registry.register_model("img2prompt_vqa")
class Img2PromptModel(_ZooModel):
    """Img2Prompt composite zoo entry (reference lavis/models/img2prompt_models/)."""

    arch = "img2prompt_vqa"

    def __init__(self, model_path: Optional[str] = None, *,
                 itm_path: Optional[str] = None, cap_path: Optional[str] = None,
                 qg_path: Optional[str] = None, block_num: int = 7, **kw):
        from llava_align_tpu.models import img2prompt as i2p_mod

        explicit = {k: v for k, v in
                    (("itm", itm_path), ("cap", cap_path), ("qg", qg_path)) if v}
        if (model_path and not model_path.startswith("random")) or len(explicit) == 3:
            # composite assembly mirroring the reference img2prompt_vqa
            # from_config (lavis/models/img2prompt_models/img2prompt_vqa.py:
            # BLIP-ITM + BLIP-caption + T5 question-generation checkpoint)
            from llava_align_tpu.utils.hf_convert import load_blip_t5_composite

            params, cfgs = load_blip_t5_composite(
                model_path or "", qa_key="qg", paths=explicit or None
            )
            cfg = i2p_mod.Img2PromptConfig(
                itm=cfgs["itm"], cap=cfgs["cap"], qg=cfgs["qg"],
                block_num=block_num,
            )
        else:
            cfg = i2p_mod.Img2PromptConfig.tiny()
            params = i2p_mod.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def prompts_construction(self, *args, **kw):
        from llava_align_tpu.models import img2prompt as i2p_mod

        return i2p_mod.prompts_construction(*args, **kw)


def _blip_variant_factory(arch_name: str, variant: str):
    @registry.register_model(arch_name)
    class BlipVariantModel(_ZooModel):
        """BLIP variant zoo entry (reference lavis/models/blip_models/*)."""

        arch = arch_name

        def __init__(self, model_path: Optional[str] = None,
                     num_classes: int = 2, **kw):
            from llava_align_tpu.models import blip as blip_base
            from llava_align_tpu.models import blip_variants as bv_mod

            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.utils.hf_convert import (
                    convert_blip_nlvr, convert_blip_variant, load_state_dict,
                )

                sd = load_state_dict(model_path)
                if variant == "nlvr":
                    cfg = bv_mod.NlvrConfig(num_classes=num_classes)
                    params = convert_blip_nlvr(sd, cfg)
                else:
                    cfg = blip_base.BlipConfig()
                    params = convert_blip_variant(
                        sd, cfg, variant, num_classes=num_classes
                    )
            else:
                if variant == "nlvr":
                    cfg = bv_mod.NlvrConfig.tiny()
                    params = bv_mod.init_nlvr(jax.random.PRNGKey(0), cfg)
                else:
                    cfg = blip_base.BlipConfig.tiny()
                    params = {
                        "retrieval": bv_mod.init_retrieval,
                        "vqa": bv_mod.init_vqa,
                        "classification": lambda r, c: bv_mod.init_classification(
                            r, c, num_classes
                        ),
                        "pretrain": bv_mod.init_retrieval,
                    }[variant](jax.random.PRNGKey(0), cfg)
                    if variant == "pretrain":
                        from llava_align_tpu.models.blip import med_init

                        params["decoder"] = med_init(jax.random.PRNGKey(1), cfg.text)
            self.variant = variant
            super().__init__(params, cfg)

        def predict_answers(self, *args, **kw):
            from llava_align_tpu.models import blip_variants as bv_mod

            return bv_mod.vqa_rank_answers(self.params, self.cfg, *args, **kw)

        def generate(self, *args, **kw):
            from llava_align_tpu.models import blip_variants as bv_mod

            return bv_mod.vqa_generate(self.params, self.cfg, *args, **kw)

        def predict(self, *args, **kw):
            from llava_align_tpu.models import blip_variants as bv_mod

            if self.variant == "nlvr":
                return bv_mod.nlvr_forward(self.params, self.cfg, *args, **kw)
            return bv_mod.classify(self.params, self.cfg, *args, **kw)

        def compute_sim_matrix(self, pixels, text_ids, text_mask, **kw):
            from llava_align_tpu.models import blip as blip_base

            if self.variant not in ("retrieval", "pretrain"):
                raise ValueError(
                    f"compute_sim_matrix needs ITC projections; the "
                    f"{self.variant!r} variant has none (use blip_retrieval)"
                )
            return blip_base.compute_sim_matrix(
                self.params, self.cfg, pixels, text_ids, text_mask, **kw
            )

    BlipVariantModel.__name__ = f"BlipVariantModel_{arch_name}"
    return BlipVariantModel


for _arch, _variant in (
    ("blip_retrieval", "retrieval"),
    ("blip_vqa", "vqa"),
    ("blip_classification", "classification"),
    ("blip_nlvr", "nlvr"),
    ("blip_pretrain", "pretrain"),
):
    _blip_variant_factory(_arch, _variant)


@registry.register_model("blip_diffusion")
class BlipDiffusionModel(_ZooModel):
    """BLIP-diffusion zoo entry (reference lavis/models/blip_diffusion_models/).

    Ships the reference's own layers (ctx-CLIP, Q-Former subject embedding,
    DDPM loss, DDIM+CFG loop); the UNet/VAE are caller-provided jittable
    apply functions — the reference delegates them to the external diffusers
    library, which is not vendored there either."""

    arch = "blip_diffusion"

    def __init__(self, model_path: Optional[str] = None, **kw):
        from llava_align_tpu.models import blip_diffusion as bd_mod

        cfg = bd_mod.BlipDiffusionConfig.tiny()
        params = bd_mod.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def generate(self, *args, **kw):
        from llava_align_tpu.models import blip_diffusion as bd_mod

        return bd_mod.generate(self.params, self.cfg, *args, **kw)

    def train_loss(self, *args, **kw):
        from llava_align_tpu.models import blip_diffusion as bd_mod

        return bd_mod.train_loss(self.params, self.cfg, *args, **kw)


def _blip2_stage1_factory(arch_name: str):
    @registry.register_model(arch_name)
    class Blip2Stage1Model(_ZooModel):
        """Stage-1 BLIP-2 zoo entry (reference blip2_qformer.py — registered
        as both 'blip2' and 'blip2_feature_extractor' :25-26 — and
        blip2_image_text_matching.py Blip2ITM)."""

        arch = arch_name

        def __init__(self, model_path: Optional[str] = None, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.utils.hf_convert import (
                    convert_blip2_stage1, load_state_dict,
                )

                cfg = blip2_mod.Blip2QformerConfig()
                params = convert_blip2_stage1(load_state_dict(model_path), cfg)
            else:
                cfg = blip2_mod.Blip2QformerConfig.tiny()
                params = blip2_mod.init_stage1(jax.random.PRNGKey(0), cfg)
            super().__init__(params, cfg)

        def forward(self, images, text_ids, text_mask, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            if arch_name == "blip2_image_text_matching":
                return blip2_mod.match(
                    self.params, self.cfg, images, text_ids, text_mask,
                    match_head=kw.pop("match_head", "itm"),
                )
            return blip2_mod.pretrain_forward(
                self.params, self.cfg, images, text_ids, text_mask, **kw
            )

        def generate(self, images, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            return blip2_mod.generate_caption(self.params, self.cfg, images, **kw)

        def extract_features(self, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            return blip2_mod.extract_features(self.params, self.cfg, **kw)

        def compute_sim_matrix(self, images, text_ids, text_mask, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            return blip2_mod.compute_sim_matrix(
                self.params, self.cfg, images, text_ids, text_mask, **kw
            )

    Blip2Stage1Model.__name__ = f"Blip2Stage1Model_{arch_name}"
    return Blip2Stage1Model


for _arch in ("blip2", "blip2_feature_extractor", "blip2_image_text_matching"):
    _blip2_stage1_factory(_arch)


def _blip2_lm_factory(arch_name: str):
    @registry.register_model(arch_name)
    class Blip2LmModel(_ZooModel):
        """BLIP-2 LM-backend zoo entry (reference blip2_opt.py, blip2_t5.py,
        blip2_t5_instruct.py). 'blip2_t5_instruct' feeds the instruction into
        the Q-Former (qformer_text_input=True)."""

        arch = arch_name

        def __init__(self, model_path: Optional[str] = None, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            is_opt = arch_name == "blip2_opt"
            if model_path and not model_path.startswith("random"):
                from llava_align_tpu.utils.hf_convert import (
                    convert_blip2_opt, convert_blip2_t5, load_state_dict,
                )

                sd = load_state_dict(model_path)
                if is_opt:
                    cfg = blip2_mod.Blip2OptConfig()
                    params = convert_blip2_opt(sd, cfg)
                else:
                    cfg = blip2_mod.Blip2T5Config()
                    params = convert_blip2_t5(sd, cfg)
            else:
                if is_opt:
                    cfg = blip2_mod.Blip2OptConfig.tiny()
                    params = blip2_mod.init_opt(jax.random.PRNGKey(0), cfg)
                else:
                    cfg = blip2_mod.Blip2T5Config.tiny()
                    params = blip2_mod.init_t5(jax.random.PRNGKey(0), cfg)
            super().__init__(params, cfg)

        def forward(self, images, *args, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            if arch_name == "blip2_opt":
                return blip2_mod.opt_forward_loss(self.params, self.cfg, images, *args, **kw)
            return blip2_mod.t5_forward_loss(self.params, self.cfg, images, *args, **kw)

        def generate(self, images, prompt_ids, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            if arch_name == "blip2_opt":
                raise NotImplementedError(
                    "blip2_opt generation runs through the DecodeEngine with "
                    "Blip2OptAdapter + precomputed_feats (see "
                    "tests/test_blip2_variants.py)"
                )
            return blip2_mod.t5_generate(self.params, self.cfg, images, prompt_ids, **kw)

        def predict_answers(self, images, prompt_ids, **kw):
            # blip2_t5.predict_answers == greedy generate over the question
            # prompt (blip2_t5.py:247-312)
            return self.generate(images, prompt_ids, **kw)

        def predict_class(self, images, input_ids, input_mask, cand_ids,
                          qformer_text_ids=None, qformer_text_mask=None, **kw):
            from llava_align_tpu.models import blip2 as blip2_mod

            if arch_name == "blip2_opt":
                raise NotImplementedError("predict_class is a T5-instruct path")
            if arch_name == "blip2_t5_instruct" and qformer_text_ids is not None:
                q_emb = blip2_mod.encode_image_queries_instruct(
                    self.params, self.cfg, images, qformer_text_ids, qformer_text_mask
                )
            else:
                q_emb = blip2_mod.encode_image_queries(self.params, self.cfg, images)
            enc_hidden, enc_mask = blip2_mod.t5_encode_with_prefix(
                self.params, self.cfg, q_emb, input_ids, input_mask
            )
            import numpy as _np

            losses = blip2_mod.t5_candidate_losses(
                self.params, self.cfg, enc_hidden, enc_mask, cand_ids, **kw
            )
            return _np.argsort(_np.asarray(losses), axis=-1)

    Blip2LmModel.__name__ = f"Blip2LmModel_{arch_name}"
    return Blip2LmModel


for _arch in ("blip2_opt", "blip2_t5", "blip2_t5_instruct"):
    _blip2_lm_factory(_arch)


@registry.register_model("pnp_unifiedqav2_fid")
class PnpUnifiedQAv2FiDModel(_ZooModel):
    """Standalone Fusion-in-Decoder QA reader (reference
    pnp_vqa_models/pnp_unifiedqav2_fid.py — a T5ForConditionalGeneration whose
    encoder reshapes [B, n_ctx, S] into per-context encodes and fuses the
    states along sequence)."""

    arch = "pnp_unifiedqav2_fid"

    def __init__(self, model_path: Optional[str] = None, **kw):
        from llava_align_tpu.models.t5 import T5Config

        if model_path and not model_path.startswith("random"):
            from llava_align_tpu.utils.hf_convert import (
                _load_component_sd, convert_t5, t5_config_from_json,
            )

            sd, cfg_json = _load_component_sd(model_path)
            cfg = t5_config_from_json(cfg_json)
            params = convert_t5(sd, cfg)
        else:
            from llava_align_tpu.models import t5 as t5_mod

            cfg = T5Config.tiny()
            params = t5_mod.init(jax.random.PRNGKey(0), cfg)
        super().__init__(params, cfg)

    def generate(self, context_ids, context_mask, **kw):
        from llava_align_tpu.models import pnp_vqa as pnp_mod

        return pnp_mod.fid_generate(self.params, self.cfg, context_ids, context_mask, **kw)


# ---------------------------------------------------------------------------
# front door (reference lavis/models/__init__.py:95-300 — load_model,
# load_preprocess, load_model_and_preprocess, and the model_zoo listing)
# ---------------------------------------------------------------------------

# default preprocess per arch family: the reference reads these from each
# model type's yaml `preprocess:` block; the families map to a small fixed
# set of processor registrations, reproduced here.
_DEFAULT_PREPROCESS: Dict[str, Dict[str, Dict[str, Optional[str]]]] = {
    "blip": {
        "vis": {"train": "blip_image_train", "eval": "blip_image_eval"},
        "text": {"train": "blip_caption", "eval": "blip_caption"},
    },
    "blip2": {
        "vis": {"train": "blip2_image_train", "eval": "blip_image_eval"},
        "text": {"train": "blip_caption", "eval": "blip_caption"},
    },
    "albef": {
        "vis": {"train": "blip_image_train", "eval": "blip_image_eval"},
        "text": {"train": "blip_caption", "eval": "blip_caption"},
    },
    "alpro": {
        "vis": {"train": "alpro_video_train", "eval": "alpro_video_eval"},
        "text": {"train": "blip_caption", "eval": "blip_caption"},
    },
    "clip": {
        "vis": {"train": "clip_image_train", "eval": "clip_image_eval"},
        "text": {"train": None, "eval": None},
    },
    "gpt": {
        "vis": {"train": "gpt_video_ft", "eval": "gpt_video_ft"},
        "text": {"train": "gpt_dialogue", "eval": "gpt_dialogue"},
    },
    "blip_diffusion": {
        "vis": {
            "train": "blip_diffusion_inp_image_train",
            "eval": "blip_diffusion_inp_image_eval",
        },
        "text": {"train": "blip_caption", "eval": "blip_caption"},
    },
    "pnp": {
        "vis": {"train": None, "eval": "blip_image_eval"},
        "text": {"train": None, "eval": "blip_caption"},
    },
    "img2prompt": {
        "vis": {"train": None, "eval": "blip_image_eval"},
        "text": {"train": None, "eval": "blip_caption"},
    },
}


def _preprocess_family(name: str) -> Optional[Dict[str, Dict[str, Optional[str]]]]:
    for prefix in ("blip_diffusion", "blip2", "img2prompt", "pnp", "blip",
                   "albef", "alpro", "clip", "gpt"):
        if name.startswith(prefix):
            return _DEFAULT_PREPROCESS[prefix]
    return None


def load_preprocess(config: Dict[str, Any]):
    """Build (vis_processors, txt_processors) dicts keyed train/eval from a
    preprocess config {"vis_processor": {"train": {"name": ..., **kw}, ...},
    "text_processor": {...}} (reference load_preprocess :129-179). Missing
    entries fall back to identity."""

    from llava_align_tpu.framework import processors  # noqa: F401 — registrations

    def build(cfg):
        if not cfg:
            return lambda x: x
        cfg = dict(cfg)
        name = cfg.pop("name")
        cls = registry.get_processor_class(name)
        if cls is None:
            raise KeyError(f"unknown processor {name!r}")
        return cls(**cfg)

    vis_cfg = (config or {}).get("vis_processor") or {}
    txt_cfg = (config or {}).get("text_processor") or {}
    vis = {k: build(vis_cfg.get(k)) for k in ("train", "eval")}
    txt = {k: build(txt_cfg.get(k)) for k in ("train", "eval")}
    return vis, txt


def load_model(name: str, model_path: Optional[str] = None, **kw):
    """Build a registered model by name (reference load_model :95-126;
    checkpoint loading folds into the zoo constructors' model_path)."""
    return registry.get_model_class(name)(model_path=model_path, **kw)


def load_model_and_preprocess(name: str, model_path: Optional[str] = None, **kw):
    """reference load_model_and_preprocess :181-224 — returns
    (model, vis_processors, txt_processors) with the family's default
    preprocess registrations."""
    model = load_model(name, model_path, **kw)
    fam = _preprocess_family(name)
    if fam is None:
        return model, None, None
    cfg = {
        "vis_processor": {
            k: ({"name": v} if v else None) for k, v in fam["vis"].items()
        },
        "text_processor": {
            k: ({"name": v} if v else None) for k, v in fam["text"].items()
        },
    }
    vis, txt = load_preprocess(cfg)
    return model, vis, txt


class ModelZoo:
    """String listing of registered architectures (reference ModelZoo
    :228-267; types collapse to the zoo presets)."""

    def __init__(self):
        self.model_zoo = {name: ["default"] for name in registry.list("model")}

    def __str__(self):
        header = "=" * 50 + "\n" + f"{'Architectures':<30} {'Types'}\n" + "=" * 50
        rows = [f"{n:<30} {', '.join(t)}" for n, t in sorted(self.model_zoo.items())]
        return header + "\n" + "\n".join(rows)

    def __iter__(self):
        return iter(self.model_zoo.items())

    def __len__(self):
        return sum(len(v) for v in self.model_zoo.values())


model_zoo = ModelZoo()
