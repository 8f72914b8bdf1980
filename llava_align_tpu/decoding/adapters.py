"""Model adapters: the decode engine's interface to each VLM family.

The reference couples its sampler to each model through
`prepare_inputs_for_generation[_cd]` hooks monkey-wired per fork
(llava_llama.py:130-197, modeling_qwen.py:1089-1118,
lavis modeling_llama.py:764-792). Here the coupling is one explicit adapter
object per family; the engine is family-agnostic.

Branch-degradation semantics per family:
  llava: 'unk' → IMAGE_TOKEN_INDEX→token 0; 'none' → sentinel removed
         (vcd_sample.py:153-160)
  qwen:  'none' → the whole <img>…</img> span (start/pads/end) removed —
         the reference expresses this at prompt level
         (qwen_calibrate.py:34-39); 'unk' needs tokenizer text ("None"
         prefix) so runners pass explicit branch ids instead.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from llava_align_tpu.config import LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX

Params = Dict[str, Any]

UNK_TOKEN_ID = 0  # reference vcd_sample.py:155


class LlavaAdapter:
    name = "llava"

    def __init__(self, cfg: LlavaConfig):
        self.cfg = cfg

    # --- static properties -------------------------------------------------
    @property
    def num_image_tokens(self) -> int:
        return self.cfg.num_image_tokens

    @property
    def image_size(self) -> int:
        return self.cfg.vision.image_size

    @property
    def vision_dtype(self):
        return self.cfg.vision.dtype

    @property
    def num_kv_heads(self) -> int:
        return self.cfg.text.num_kv_heads

    # --- sharding (TP over the 'model' mesh axis) ---------------------------
    def int8_tp_ready(self, params, n_shards: int) -> bool:
        """True iff every int8 stack's per-shard dim stays lane-aligned —
        then the engine runs the quantized matmuls tensor-parallel via
        shard_map (ops/quant.int8_matmul_stacked_tp)."""
        from llava_align_tpu.ops.quant import (
            int8_tp_aligned, int8_tp_mode, is_quantized,
        )

        layers = params.get("llama", {}).get("layers", {})
        qs = {k: v for k, v in layers.items() if is_quantized(v)}
        if not qs:
            return False
        return all(
            int8_tp_aligned(v, int8_tp_mode(k), n_shards) for k, v in qs.items()
        )

    def int8_tp_pad(self, params, n_shards: int):
        """Lane-align misaligned int8 MLP stacks by bit-inert padding so
        int8_tp_ready can hold at any power-of-two TP degree (7B's 11008
        intermediate aligns only at TP<=4 unpadded). Returns params unchanged
        when there is nothing to pad."""
        from llava_align_tpu.ops.quant import pad_llama_quantized_for_tp

        llama_p = params.get("llama")
        if not isinstance(llama_p, dict) or "layers" not in llama_p:
            return params
        new_layers, changed = pad_llama_quantized_for_tp(llama_p["layers"], n_shards)
        if not changed:
            return params
        return dict(params, llama=dict(llama_p, layers=new_layers))

    def param_shardings(self, params, mesh):
        """Megatron-style TP placement for the whole param tree (engine
        `mesh=` support; replaces reference device_map='auto', builder.py:27).
        Unspecified leaves replicate. Aligned int8 stacks shard column/row
        so the shard_map TP kernels read local shards."""
        from llava_align_tpu.parallel import sharding as shd

        partial = shd.llava_param_shardings(self.cfg, mesh, params)
        n = int(mesh.shape.get("model", 1))
        if n > 1 and self.int8_tp_ready(params, n):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from llava_align_tpu.ops.quant import int8_tp_mode, is_quantized

            lay = dict(partial["llama"]["layers"])
            for k, v in params["llama"]["layers"].items():
                if is_quantized(v):
                    spec = (
                        P(None, "model", None)
                        if int8_tp_mode(k) == "column"
                        else P(None, None, "model")
                    )
                    lay[k] = NamedSharding(mesh, spec)
            partial["llama"] = dict(partial["llama"], layers=lay)
        return shd.complete_shardings(params, partial, mesh)

    # --- token-level branch degradation ------------------------------------
    def branch_token_ids(self, input_ids: Sequence[int], kind: str) -> List[int]:
        ids = [int(t) for t in input_ids]
        if kind in ("main", "cd"):
            return ids
        if kind == "unk":
            return [UNK_TOKEN_ID if t == IMAGE_TOKEN_INDEX else t for t in ids]
        if kind == "none":
            return [t for t in ids if t != IMAGE_TOKEN_INDEX]
        raise ValueError(kind)

    # --- device-side model ops ----------------------------------------------
    def encode_images(self, params: Params, images: jax.Array) -> jax.Array:
        from llava_align_tpu.models import llava

        return llava.encode_images(params, self.cfg, images)

    def splice_embeds(self, params, tokens, tok_g, img_g, is_img, feats):
        from llava_align_tpu.models import llava

        return llava.splice_embeds(params, self.cfg, tokens, tok_g, img_g, is_img, feats)

    def embed_tokens(self, params: Params, ids: jax.Array) -> jax.Array:
        from llava_align_tpu.models import llama

        return llama.embed_tokens(params["llama"], ids)

    def init_cache(self, batch: int, max_len: int):
        from llava_align_tpu.models import llama

        return llama.init_cache(self.cfg.text, batch, max_len, kv_quant=self.kv_quant)

    def forward(self, params, embeds, positions, cache, offsets, *, attn_impl,
                max_seq_len, cache_row_offset=0, tp_mesh=None,
                shared_kv=None, shared_len=None,
                shared_rows_per_prefix=None, shared_rows_per_prefix2=0):
        from llava_align_tpu.models import llama

        return llama.forward(
            params["llama"], self.cfg.text, embeds, positions, cache, offsets,
            attn_impl=attn_impl, cache_row_offset=cache_row_offset,
            tp_mesh=tp_mesh, shared_kv=shared_kv, shared_len=shared_len,
            shared_rows_per_prefix=shared_rows_per_prefix,
            shared_rows_per_prefix2=shared_rows_per_prefix2,
            act_quant=self.act_quant,
        )

    # Shared-prefix decoding (engine.generate_batch_prefix) needs the model
    # forward to accept a read-only prefix KV segment; llama-backed adapters
    # support it.
    supports_shared_prefix = True

    # Opt-in W8A8 prefill (set by DecodeEngine(act_quant=True)): int8 stacks
    # (supports_act_quant=False subclasses override forward() without the
    # act_quant kwarg — the engine warns and ignores the flag there)
    # run compute-bound row counts through int8-MXU matmuls with dynamic
    # activation quant — ~1.4x prefill, not bit-exact (ops/quant W8A8 note).
    act_quant = False
    supports_act_quant = True

    # Opt-in int8 KV cache (set by DecodeEngine(kv_quant="int8")): halves
    # decode-time cache HBM reads at ~1/256 relative quantization error
    # (models/llama.init_cache kv_quant + ops/quant.kv_quantize_block).
    kv_quant = False
    supports_kv_quant = True

    def logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        from llava_align_tpu.models import llama

        return llama.logits_from_hidden(params["llama"], hidden)


class LlavaMptAdapter(LlavaAdapter):
    """LLaVA with the MPT backbone (reference llava/model/language_model/
    llava_mpt.py). Same vision/splice path; the LM is models/mpt (alibi).
    cfg is models.llava_mpt.LlavaMptConfig; params keys: mpt/vision/projector."""

    name = "llava_mpt"
    supports_shared_prefix = False  # mpt.forward has no shared-segment path
    supports_act_quant = False  # mpt.forward has no act_quant path
    supports_kv_quant = False  # mpt.init_cache has no int8 layout

    @property
    def num_kv_heads(self) -> int:
        return self.cfg.text.kv_heads

    def param_shardings(self, params, mesh):
        from llava_align_tpu.parallel import sharding as shd

        return shd.complete_shardings(
            params, {"mpt": shd.mpt_param_shardings(mesh)}, mesh
        )

    def embed_tokens(self, params: Params, ids: jax.Array) -> jax.Array:
        from llava_align_tpu.models import mpt

        return mpt.embed_tokens(params["mpt"], ids)

    def splice_embeds(self, params, tokens, tok_g, img_g, is_img, feats):
        text_emb = self.embed_tokens(params, tokens)
        gathered_text = jnp.take_along_axis(text_emb, tok_g[..., None], axis=1)
        gathered_img = jnp.take_along_axis(feats, img_g[..., None], axis=1).astype(
            gathered_text.dtype
        )
        return jnp.where(is_img[..., None], gathered_img, gathered_text)

    def encode_images(self, params: Params, images: jax.Array) -> jax.Array:
        from llava_align_tpu.models import clip_vit, projector

        feats = clip_vit.forward_features(params["vision"], self.cfg.vision, images)
        return projector.forward(params["projector"], feats.astype(self.cfg.text.dtype))

    def init_cache(self, batch: int, max_len: int):
        from llava_align_tpu.models import mpt

        return mpt.init_cache(self.cfg.text, batch, max_len)

    def forward(self, params, embeds, positions, cache, offsets, *, attn_impl,
                max_seq_len, cache_row_offset=0, tp_mesh=None):
        from llava_align_tpu.models import mpt

        return mpt.forward(
            params["mpt"], self.cfg.text, embeds, positions, cache, offsets,
            attn_impl=attn_impl, cache_row_offset=cache_row_offset,
        )

    def logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        from llava_align_tpu.models import mpt

        return mpt.logits_from_hidden(params["mpt"], hidden)


class InstructBlipAdapter:
    """InstructBLIP: the 32 projected Q-Former query embeddings act as the
    "image features"; prompts are [sentinel] + Vicuna token ids. Because the
    Q-Former is text-conditioned (instruction tokens), feature encoding
    happens OUTSIDE the engine (models/instructblip.encode) and is passed via
    generate(..., precomputed_feats=...) — mirroring the reference, which
    computes inputs_llm/inputs_llm_cd once per question before llm.generate
    (blip2_vicuna_instruct.py:330-410)."""

    name = "instructblip"
    act_quant = False  # see LlavaAdapter.act_quant
    supports_act_quant = True
    kv_quant = False  # see LlavaAdapter.kv_quant
    supports_kv_quant = True

    def __init__(self, cfg):
        self.cfg = cfg  # models.instructblip.InstructBlipConfig

    @property
    def num_image_tokens(self) -> int:
        return self.cfg.num_query_tokens

    @property
    def image_size(self) -> int:
        return self.cfg.vision.image_size

    @property
    def vision_dtype(self):
        return self.cfg.vision.dtype

    @property
    def num_kv_heads(self) -> int:
        return self.cfg.text.num_kv_heads

    def param_shardings(self, params, mesh):
        from llava_align_tpu.parallel import sharding as shd

        partial = {}
        if "llama" in params:
            partial["llama"] = shd.llama_param_shardings(self.cfg.text, mesh)
        return shd.complete_shardings(params, partial, mesh)

    def branch_token_ids(self, input_ids: Sequence[int], kind: str) -> List[int]:
        ids = [int(t) for t in input_ids]
        if kind in ("main", "cd"):
            return ids
        if kind == "none":
            # use_image=False: text-only stream, no query embeddings
            return [t for t in ids if t != IMAGE_TOKEN_INDEX]
        raise ValueError(f"instructblip does not define branch '{kind}'")

    def encode_images(self, params, images):
        raise NotImplementedError(
            "InstructBLIP features are text-conditioned; encode with "
            "models.instructblip.encode and pass precomputed_feats to generate()"
        )

    def splice_embeds(self, params, tokens, tok_g, img_g, is_img, feats):
        from llava_align_tpu.models import llama

        text_emb = llama.embed_tokens(params["llama"], tokens)
        gathered_text = jnp.take_along_axis(text_emb, tok_g[..., None], axis=1)
        gathered_img = jnp.take_along_axis(feats, img_g[..., None], axis=1).astype(
            gathered_text.dtype
        )
        return jnp.where(is_img[..., None], gathered_img, gathered_text)

    def embed_tokens(self, params, ids):
        from llava_align_tpu.models import llama

        return llama.embed_tokens(params["llama"], ids)

    def init_cache(self, batch: int, max_len: int):
        from llava_align_tpu.models import llama

        return llama.init_cache(self.cfg.text, batch, max_len, kv_quant=self.kv_quant)

    supports_shared_prefix = True

    def forward(self, params, embeds, positions, cache, offsets, *, attn_impl,
                max_seq_len, cache_row_offset=0, tp_mesh=None,
                shared_kv=None, shared_len=None,
                shared_rows_per_prefix=None, shared_rows_per_prefix2=0):
        from llava_align_tpu.models import llama

        return llama.forward(
            params["llama"], self.cfg.text, embeds, positions, cache, offsets,
            attn_impl=attn_impl, cache_row_offset=cache_row_offset,
            shared_kv=shared_kv, shared_len=shared_len,
            shared_rows_per_prefix=shared_rows_per_prefix,
            shared_rows_per_prefix2=shared_rows_per_prefix2,
            act_quant=self.act_quant,
        )

    def logits(self, params, hidden):
        from llava_align_tpu.models import llama

        return llama.logits_from_hidden(params["llama"], hidden)


class Blip2OptAdapter(InstructBlipAdapter):
    """BLIP-2 with the OPT backbone (reference blip2_opt): query-only Q-Former
    features as the prompt prefix, OPT decoding. Uses precomputed feats like
    InstructBLIP (models/blip2.encode_image_queries)."""

    name = "blip2_opt"
    supports_shared_prefix = False
    supports_act_quant = False  # opt.forward has no act_quant path
    supports_kv_quant = False  # opt.init_cache has no int8 layout

    @property
    def num_kv_heads(self) -> int:
        return self.cfg.text.num_heads

    def param_shardings(self, params, mesh):
        from llava_align_tpu.parallel import sharding as shd

        partial = {}
        if "lm" in params:
            partial["lm"] = shd.opt_param_shardings(mesh)
        return shd.complete_shardings(params, partial, mesh)

    def splice_embeds(self, params, tokens, tok_g, img_g, is_img, feats):
        from llava_align_tpu.models import opt

        text_emb = opt.embed_tokens(params["lm"], tokens)
        gathered_text = jnp.take_along_axis(text_emb, tok_g[..., None], axis=1)
        gathered_img = jnp.take_along_axis(feats, img_g[..., None], axis=1).astype(
            gathered_text.dtype
        )
        return jnp.where(is_img[..., None], gathered_img, gathered_text)

    def embed_tokens(self, params, ids):
        from llava_align_tpu.models import opt

        return opt.embed_tokens(params["lm"], ids)

    def init_cache(self, batch: int, max_len: int):
        from llava_align_tpu.models import opt

        return opt.init_cache(self.cfg.text, batch, max_len)

    def forward(self, params, embeds, positions, cache, offsets, *, attn_impl,
                max_seq_len, cache_row_offset=0, tp_mesh=None):
        from llava_align_tpu.models import opt

        return opt.forward(
            params["lm"], self.cfg.text, embeds, positions, cache, offsets,
            attn_impl=attn_impl, cache_row_offset=cache_row_offset,
        )

    def logits(self, params, hidden):
        from llava_align_tpu.models import opt

        return opt.logits_from_hidden(params["lm"], hidden)


class QwenVLAdapter:
    """Qwen-VL: in-band image spans. Callers mark the 256-token image span
    with a single IMAGE_TOKEN_INDEX sentinel (models/qwen_vl.sentinelize_span);
    the splice plan expands it to n_queries feature slots framed by the real
    img_start/img_end tokens."""

    name = "qwen_vl"
    supports_shared_prefix = True
    act_quant = False  # see LlavaAdapter.act_quant
    supports_act_quant = True
    kv_quant = False  # see LlavaAdapter.kv_quant
    supports_kv_quant = True

    def __init__(self, cfg):
        self.cfg = cfg  # models.qwen_vl.QwenVLConfig

    @property
    def num_image_tokens(self) -> int:
        return self.cfg.vision.n_queries

    @property
    def image_size(self) -> int:
        return self.cfg.vision.image_size

    @property
    def vision_dtype(self):
        return self.cfg.vision.dtype

    @property
    def num_kv_heads(self) -> int:
        return self.cfg.text.num_heads  # qwen is MHA: kv heads == heads

    def param_shardings(self, params, mesh):
        from llava_align_tpu.parallel import sharding as shd

        return shd.complete_shardings(
            params, {"qwen": shd.qwen_param_shardings(mesh)}, mesh
        )

    def branch_token_ids(self, input_ids: Sequence[int], kind: str) -> List[int]:
        ids = [int(t) for t in input_ids]
        if kind in ("main", "cd"):
            return ids
        if kind == "none":
            # drop the whole <img>…</img> block: sentinel plus framing tokens
            out = []
            for i, t in enumerate(ids):
                if t == IMAGE_TOKEN_INDEX:
                    continue
                if t in (self.cfg.image_start_id, self.cfg.image_end_id):
                    continue
                out.append(t)
            return out
        raise ValueError(
            f"qwen branch '{kind}' requires tokenizer text; pass explicit "
            "branch ids via generate(..., branch_ids={...})"
        )

    def encode_images(self, params: Params, images: jax.Array) -> jax.Array:
        from llava_align_tpu.models import qwen_vit

        return qwen_vit.forward(params["visual"], self.cfg.vision, images).astype(
            self.cfg.text.dtype
        )

    def splice_embeds(self, params, tokens, tok_g, img_g, is_img, feats):
        from llava_align_tpu.models import qwen

        text_emb = qwen.embed_tokens(params["qwen"], tokens)
        gathered_text = jnp.take_along_axis(text_emb, tok_g[..., None], axis=1)
        gathered_img = jnp.take_along_axis(feats, img_g[..., None], axis=1).astype(
            gathered_text.dtype
        )
        return jnp.where(is_img[..., None], gathered_img, gathered_text)

    def embed_tokens(self, params: Params, ids: jax.Array) -> jax.Array:
        from llava_align_tpu.models import qwen

        return qwen.embed_tokens(params["qwen"], ids)

    def init_cache(self, batch: int, max_len: int):
        from llava_align_tpu.models import qwen

        return qwen.init_cache(self.cfg.text, batch, max_len, kv_quant=self.kv_quant)

    def forward(self, params, embeds, positions, cache, offsets, *, attn_impl,
                max_seq_len, cache_row_offset=0, tp_mesh=None,
                shared_kv=None, shared_len=None,
                shared_rows_per_prefix=None, shared_rows_per_prefix2=0):
        from llava_align_tpu.models import qwen

        return qwen.forward(
            params["qwen"], self.cfg.text, embeds, positions, cache, offsets,
            ntk_alpha=qwen.ntk_alpha_for_len(self.cfg.text, max_seq_len),
            attn_impl=attn_impl, cache_row_offset=cache_row_offset,
            shared_kv=shared_kv, shared_len=shared_len,
            shared_rows_per_prefix=shared_rows_per_prefix,
            shared_rows_per_prefix2=shared_rows_per_prefix2,
            act_quant=self.act_quant,
        )

    def logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        from llava_align_tpu.models import qwen

        return qwen.logits_from_hidden(params["qwen"], hidden)
