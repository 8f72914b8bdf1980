"""BLIP base (ViT + MED BERT): captioning, image-text matching, features.

Capability parity: the reference's vendored LAVIS BLIP family
(lavis/models/blip_models/blip_caption.py, blip_image_text_matching.py,
blip_feature_extractor.py) built on lavis/models/vit.py (a timm ViT) and
lavis/models/med.py (BERT with cross-attention — a fork of HF Bert). The
reference's own experiments never execute these models (SURVEY §2.4); they
are provided for model-zoo completeness.

TPU-first: stacked [L, ...] layer params under `lax.scan`, fp32 softmax/LN,
self-KV cache + one-shot cross-KV incremental decoding (same scheme as
models/t5.py), and HF-exact beam search reused from decoding/beam.py.
Parity oracles are HF modules (the med fork's upstream): BertLMHeadModel
(is_decoder + add_cross_attention) and ViTModel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]
NEG = -1e30


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlipVitConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def ffn_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @staticmethod
    def tiny() -> "BlipVitConfig":
        return BlipVitConfig(
            image_size=32, patch_size=16, hidden_size=32, num_layers=2,
            num_heads=4,
        )


@dataclasses.dataclass(frozen=True)
class MedConfig:
    vocab_size: int = 30524  # bert-base-uncased + [DEC]/[ENC]
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    # ALBEF/ALPRO fusion point (reference med.py BertLayer: cross-attention
    # exists only in layers >= fusion_layer; mode "text" runs layers
    # [0, fusion_layer), mode "fusion" runs [fusion_layer, L)). None = BLIP
    # behavior: cross-attention in every layer, "text" runs all layers.
    fusion_layer: Optional[int] = None
    # med.py BertEmbeddings adds token-type embeddings ONLY when
    # token_type_ids are explicitly passed (med.py:111-115) — BLIP callers
    # never pass them (no type vector added, unlike HF Bert's zeros
    # default), ALPRO passes zeros (type[0] added). True = HF/ALPRO
    # behavior; set False for BLIP-family configs.
    use_type_embeddings: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(vocab_size: int = 64) -> "MedConfig":
        return MedConfig(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
        )


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    vision: BlipVitConfig = dataclasses.field(default_factory=BlipVitConfig)
    # BLIP callers never pass token_type_ids → med.py adds no type vector
    text: MedConfig = dataclasses.field(
        default_factory=lambda: MedConfig(use_type_embeddings=False)
    )
    embed_dim: int = 256  # ITC projection width

    @staticmethod
    def tiny(vocab_size: int = 64) -> "BlipConfig":
        return BlipConfig(
            vision=BlipVitConfig.tiny(),
            text=dataclasses.replace(
                MedConfig.tiny(vocab_size), use_type_embeddings=False
            ),
            embed_dim=16,
        )


# ---------------------------------------------------------------------------
# ViT encoder (lavis vit.py / HF ViTModel structure: pre-LN blocks, cls token)
# ---------------------------------------------------------------------------


def vit_init(rng: jax.Array, cfg: BlipVitConfig) -> Params:
    ks = iter(jax.random.split(rng, 10))
    D, F, L = cfg.hidden_size, cfg.ffn_dim, cfg.num_layers
    P = cfg.num_patches

    def w(shape, fan):
        return (jax.random.normal(next(ks), shape, jnp.float32) / fan**0.5).astype(cfg.dtype)

    def ln():
        return {"scale": jnp.ones((L, D), cfg.dtype), "bias": jnp.zeros((L, D), cfg.dtype)}

    def lin(o, i):
        return {"w": w((L, o, i), i), "b": jnp.zeros((L, o), cfg.dtype)}

    return {
        "cls": w((1, 1, D), D),
        "pos": w((1, P + 1, D), D),
        "patch": {"w": w((D, 3, cfg.patch_size, cfg.patch_size), 3 * cfg.patch_size**2),
                  "b": jnp.zeros((D,), cfg.dtype)},
        "layers": {
            "ln1": ln(), "q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
            "o": lin(D, D), "ln2": ln(), "fc1": lin(F, D), "fc2": lin(D, F),
        },
        "final_ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
    }


def _lin(h, p):
    return jnp.einsum("...d,od->...o", h, p["w"], preferred_element_type=h.dtype) + p["b"]


def _mha(q, k, v, H, mask=None):
    """q [B,Sq,D], k/v [B,Sk,D] → [B,Sq,D]; fp32 softmax."""
    B, Sq, D = q.shape
    Sk = k.shape[1]
    Dh = D // H
    qr = q.reshape(B, Sq, H, Dh)
    kr = k.reshape(B, Sk, H, Dh)
    vr = v.reshape(B, Sk, H, Dh)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", qr, kr,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / (Dh**0.5)
    if mask is not None:
        s = jnp.where(mask, s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(vr.dtype), vr,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q.dtype)
    return o.reshape(B, Sq, D)


def vit_forward(params: Params, cfg: BlipVitConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, 3, H, W] → [B, 1+N, D] (post final LN)."""
    B = pixels.shape[0]
    D, H = cfg.hidden_size, cfg.num_heads
    x = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype), params["patch"]["w"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [B, D, h, w]
    x = x.reshape(B, D, -1).transpose(0, 2, 1) + params["patch"]["b"]
    cls = jnp.broadcast_to(params["cls"], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"]
    eps = cfg.layer_norm_eps

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        a = _mha(_lin(h, lp["q"]), _lin(h, lp["k"]), _lin(h, lp["v"]), H)
        x = x + _lin(a, lp["o"])
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        x = x + _lin(jax.nn.gelu(_lin(h, lp["fc1"]), approximate=False), lp["fc2"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"], eps)


# ---------------------------------------------------------------------------
# MED BERT (post-LN; optional causal self-attn + cross-attention)
# ---------------------------------------------------------------------------


def med_init(rng: jax.Array, cfg: MedConfig) -> Params:
    ks = iter(jax.random.split(rng, 24))
    D, F, L, V = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size

    def w(shape, fan):
        return (jax.random.normal(next(ks), shape, jnp.float32) / fan**0.5).astype(cfg.dtype)

    def ln(dim=D):
        return {"scale": jnp.ones((L, dim), cfg.dtype), "bias": jnp.zeros((L, dim), cfg.dtype)}

    def lin(o, i):
        return {"w": w((L, o, i), i), "b": jnp.zeros((L, o), cfg.dtype)}

    return {
        "embeddings": {
            "word": w((V, D), D),
            "pos": w((cfg.max_position_embeddings, D), D),
            "type": jnp.zeros((2, D), cfg.dtype),
            "ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
        },
        "layers": {
            "sq": lin(D, D), "sk": lin(D, D), "sv": lin(D, D), "so": lin(D, D),
            "s_ln": ln(),
            "cq": lin(D, D), "ck": lin(D, D), "cv": lin(D, D), "co": lin(D, D),
            "c_ln": ln(),
            "fc1": lin(F, D), "fc2": lin(D, F), "f_ln": ln(),
        },
        "head": {
            "transform": {"w": w((D, D), D), "b": jnp.zeros((D,), cfg.dtype)},
            "ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
            "decoder": w((V, D), D),
            "bias": jnp.zeros((V,), cfg.dtype),
        },
    }


def med_embed(params: Params, cfg: MedConfig, ids: jax.Array, positions: jax.Array) -> jax.Array:
    e = params["embeddings"]
    x = e["word"][jnp.clip(ids, 0, cfg.vocab_size - 1)] + e["pos"][positions]
    if cfg.use_type_embeddings:
        x = x + e["type"][0]
    return layer_norm(x, e["ln"]["scale"], e["ln"]["bias"], cfg.layer_norm_eps)


def med_forward(
    params: Params,
    cfg: MedConfig,
    ids: Optional[jax.Array] = None,      # [B, S]
    attention_mask: Optional[jax.Array] = None,   # [B, S] 1=attend
    encoder_states=None,                  # [B, Se, D] or (e0, e1) for NLVR
    encoder_mask=None,                    # [B, Se] or (m0, m1)
    *,
    causal: bool = False,
    mode: str = "multimodal",
    input_embeds: Optional[jax.Array] = None,     # [B, S, D] (encoder_embeds path)
) -> jax.Array:
    """Full (non-incremental) pass → hidden [B, S, D].

    Modes follow the reference med.py BertEncoder (lavis/models/med.py:526-604):
    "text" runs layers [0, fusion_layer) without cross-attention, "fusion"
    runs [fusion_layer, L) with cross-attention (from `input_embeds`),
    "multimodal" runs all layers with cross-attention in layers >=
    fusion_layer. With fusion_layer=None (BLIP) cross-attention applies in
    every layer and "text" runs the full stack. `encoder_states` may be a
    pair for ALBEF-NLVR (med.py:451-470): fusion layer i cross-attends to
    states[(i - fusion_layer) % 2].
    """
    if input_embeds is not None:
        x = input_embeds
        B, S = x.shape[:2]
    else:
        B, S = ids.shape
        x = med_embed(params, cfg, ids, jnp.arange(S, dtype=jnp.int32)[None])
    H = cfg.num_heads
    eps = cfg.layer_norm_eps
    L = cfg.num_layers
    fl = cfg.fusion_layer if cfg.fusion_layer is not None else L

    mask = jnp.ones((B, 1, S, S), bool)
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :].astype(bool)
    if causal:
        tri = jnp.tril(jnp.ones((S, S), bool))
        mask = mask & tri[None, None]

    # normalize encoder states to a stacked [N, B, Se, D] + per-layer selector
    enc_stack = xmask_stack = None
    if encoder_states is not None:
        if isinstance(encoder_states, (tuple, list)):
            enc_stack = jnp.stack(list(encoder_states))
            if encoder_mask is not None:
                xmask_stack = jnp.stack(
                    [m[:, None, None, :].astype(bool) for m in encoder_mask]
                )
        else:
            enc_stack = encoder_states[None]
            if encoder_mask is not None:
                xmask_stack = encoder_mask[:, None, None, :].astype(bool)[None]
    n_enc = 1 if enc_stack is None else enc_stack.shape[0]

    if mode == "text":
        lo, hi = 0, fl
    elif mode == "fusion":
        if cfg.fusion_layer is None:
            raise ValueError(
                "mode='fusion' needs MedConfig.fusion_layer (BLIP configs "
                "have none — use mode='multimodal')"
            )
        lo, hi = fl, L
    else:
        lo, hi = 0, L
    cross_start = 0 if cfg.fusion_layer is None else fl

    def body(x, lp, cross, sel):
        a = _mha(_lin(x, lp["sq"]), _lin(x, lp["sk"]), _lin(x, lp["sv"]), H, mask)
        x = layer_norm(x + _lin(a, lp["so"]), lp["s_ln"]["scale"], lp["s_ln"]["bias"], eps)
        if cross:
            enc = enc_stack[sel]
            xm = xmask_stack[sel] if xmask_stack is not None else None
            a = _mha(_lin(x, lp["cq"]), _lin(enc, lp["ck"]), _lin(enc, lp["cv"]), H, xm)
            x = layer_norm(x + _lin(a, lp["co"]), lp["c_ln"]["scale"], lp["c_ln"]["bias"], eps)
        f = _lin(jax.nn.gelu(_lin(x, lp["fc1"]), approximate=False), lp["fc2"])
        x = layer_norm(x + f, lp["f_ln"]["scale"], lp["f_ln"]["bias"], eps)
        return x

    def run_segment(x, a, b, with_cross):
        if a >= b:
            return x
        seg = jax.tree_util.tree_map(lambda p: p[a:b], params["layers"])
        if with_cross:
            sels = jnp.asarray([(i - fl) % n_enc for i in range(a, b)], jnp.int32)
            return jax.lax.scan(
                lambda c, ls: (body(c, ls[0], True, ls[1]), None), x, (seg, sels)
            )[0]
        return jax.lax.scan(lambda c, lp: (body(c, lp, False, 0), None), x, seg)[0]

    use_cross = enc_stack is not None and mode != "text"
    x = run_segment(x, lo, max(lo, min(hi, cross_start)), False)
    x = run_segment(x, max(lo, cross_start), hi, use_cross)
    return x


def med_logits(params: Params, hidden: jax.Array) -> jax.Array:
    h = params["head"]
    x = jnp.einsum("...d,od->...o", hidden, h["transform"]["w"]) + h["transform"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = layer_norm(x, h["ln"]["scale"], h["ln"]["bias"], 1e-12)
    return (
        jnp.einsum("...d,vd->...v", x, h["decoder"], preferred_element_type=jnp.float32)
        + h["bias"].astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# incremental decoding (self-KV cache + one-shot cross KV, as models/t5.py)
# ---------------------------------------------------------------------------


def init_self_cache(cfg: MedConfig, batch: int, max_len: int) -> Dict[str, jax.Array]:
    shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def precompute_cross_kv(params: Params, cfg: MedConfig, encoder_states: jax.Array):
    B, Se, _ = encoder_states.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    lk = params["layers"]["ck"]
    lv = params["layers"]["cv"]
    k = (jnp.einsum("bsd,lod->lbso", encoder_states, lk["w"]) + lk["b"][:, None, None])
    v = (jnp.einsum("bsd,lod->lbso", encoder_states, lv["w"]) + lv["b"][:, None, None])
    return {
        "k": k.reshape(cfg.num_layers, B, Se, H, Dh),
        "v": v.reshape(cfg.num_layers, B, Se, H, Dh),
    }


def decode_step(
    params: Params, cfg: MedConfig,
    token_ids: jax.Array,          # [B]
    t: jax.Array,                  # scalar int32 position
    cache: Dict[str, jax.Array],
    cross_kv: Dict[str, jax.Array],
    encoder_mask: Optional[jax.Array] = None,
):
    """One causal decoder step with cross-attention → (logits [B,V], cache)."""
    B = token_ids.shape[0]
    H, Dh = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    Smax = cache["k"].shape[2]
    x = med_embed(params, cfg, token_ids[:, None], t[None, None])  # [B,1,D]

    k_pos = jnp.arange(Smax, dtype=jnp.int32)
    smask = (k_pos <= t)[None, None, None, :]
    xmask = None
    if encoder_mask is not None:
        xmask = encoder_mask[:, None, None, :].astype(bool)

    kc, vc = cache["k"], cache["v"]
    lp = params["layers"]
    for li in range(cfg.num_layers):
        l = {k: jax.tree_util.tree_map(lambda a: a[li], v) for k, v in lp.items()}
        q = (_lin(x, l["sq"])).reshape(B, 1, H, Dh)
        k_new = (_lin(x, l["sk"])).reshape(B, H, Dh)
        v_new = (_lin(x, l["sv"])).reshape(B, H, Dh)
        kc = kc.at[li, :, t].set(k_new)
        vc = vc.at[li, :, t].set(v_new)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kc[li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (Dh**0.5)
        s = jnp.where(smask, s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(vc.dtype), vc[li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype).reshape(B, 1, -1)
        x = layer_norm(x + _lin(a, l["so"]), l["s_ln"]["scale"], l["s_ln"]["bias"], eps)

        q = (_lin(x, l["cq"])).reshape(B, 1, H, Dh)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, cross_kv["k"][li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (Dh**0.5)
        if xmask is not None:
            s = jnp.where(xmask, s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(cross_kv["v"].dtype), cross_kv["v"][li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype).reshape(B, 1, -1)
        x = layer_norm(x + _lin(a, l["co"]), l["c_ln"]["scale"], l["c_ln"]["bias"], eps)

        f = _lin(jax.nn.gelu(_lin(x, l["fc1"]), approximate=False), l["fc2"])
        x = layer_norm(x + f, l["f_ln"]["scale"], l["f_ln"]["bias"], eps)

    return med_logits(params, x[:, 0]), {"k": kc, "v": vc}


# ---------------------------------------------------------------------------
# BLIP models
# ---------------------------------------------------------------------------


def init(rng: jax.Array, cfg: BlipConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    D, E = cfg.text.hidden_size, cfg.embed_dim
    ks = jax.random.split(k3, 4)

    def w(key, o, i):
        return (jax.random.normal(key, (o, i), jnp.float32) / i**0.5).astype(cfg.text.dtype)

    return {
        "visual": vit_init(k1, cfg.vision),
        "text": med_init(k2, cfg.text),
        "vision_proj": {"w": w(ks[0], E, cfg.vision.hidden_size),
                        "b": jnp.zeros((E,), cfg.text.dtype)},
        "text_proj": {"w": w(ks[1], E, D), "b": jnp.zeros((E,), cfg.text.dtype)},
        "itm_head": {"w": w(ks[2], 2, D), "b": jnp.zeros((2,), cfg.text.dtype)},
    }


def generate_caption(
    params: Params, cfg: BlipConfig,
    pixels: jax.Array,            # [B, 3, H, W]
    prompt_ids,                   # list[int] — tokenized prompt incl. bos ([DEC])
    *,
    max_new_tokens: int = 30,
    eos_token_id: int = 102,      # bert [SEP]
    num_beams: int = 1,
    length_penalty: float = 1.0,
    min_new_tokens: int = 0,
):
    """BLIP caption generation (reference blip_caption.py generate): ViT
    states cross-attended by the causal MED decoder. Greedy for num_beams=1;
    HF-exact beam search otherwise. Returns List[List[int]] (generated only)."""
    if not prompt_ids:
        raise ValueError("prompt_ids must contain at least the bos ([DEC]) token")
    enc = vit_forward(params["visual"], cfg.vision, pixels)
    B = enc.shape[0]
    P = len(prompt_ids)
    T = P + max_new_tokens
    cross = precompute_cross_kv(params["text"], cfg.text, enc)

    if num_beams == 1:
        cache = init_self_cache(cfg.text, B, T)
        step = jax.jit(
            lambda p, tok, t, c, x: decode_step(p, cfg.text, tok, t, c, x)
        )
        token = np.full((B,), prompt_ids[0], np.int32)
        done = np.zeros((B,), bool)
        rows = []
        for t in range(T - 1):
            logits, cache = step(
                params["text"], jnp.asarray(token), jnp.asarray(t, jnp.int32),
                cache, cross,
            )
            if t + 1 < P:
                nxt = np.full((B,), prompt_ids[t + 1], np.int32)
            else:
                lg = np.asarray(logits)
                if len(rows) < min_new_tokens:
                    lg[:, eos_token_id] = -1e30  # LAVIS min_length capability
                nxt = lg.argmax(-1).astype(np.int32)
                nxt = np.where(done, eos_token_id, nxt)
                rows.append(nxt)
                done |= nxt == eos_token_id
            token = nxt
            if t + 1 >= P and done.all():
                break
        ids = np.stack(rows, axis=1) if rows else np.zeros((B, 0), np.int32)
        out = []
        for b in range(B):
            row = ids[b].tolist()
            if eos_token_id in row:
                row = row[: row.index(eos_token_id)]
            out.append(row)
        return out

    # beam search (per image; beams ride the batch axis)
    from llava_align_tpu.decoding.beam import make_beam_fn

    class _MedAdapter:
        """decoding/beam.py adapter: cross-attention state rides inside
        `params` so the jitted beam fn stays cacheable."""

        @staticmethod
        def embed_tokens(p, ids):
            # word part only; positions are added in forward via decode_step
            return ids  # pass token ids through; forward re-embeds

        @staticmethod
        def forward(p, emb, positions, cache, offsets, *, attn_impl, max_seq_len,
                    cache_row_offset=0, tp_mesh=None):
            logits, cache = decode_step(
                p["text"], cfg.text, emb[:, 0], offsets[0], cache, p["cross"]
            )
            return logits[:, None], cache

        @staticmethod
        def logits(p, hidden):
            return hidden  # forward already returned logits

    beam_fn = jax.jit(make_beam_fn(
        _MedAdapter(), num_beams=num_beams, max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id, pad_token_id=0,
        length_penalty=length_penalty, min_new_tokens=min_new_tokens,
        attn_impl="xla", cache_len=T,
    ))
    prefill_step = jax.jit(
        lambda p, tok, t, c, x: decode_step(p, cfg.text, tok, t, c, x)
    )
    out = []
    for b in range(B):
        cross_b = jax.tree_util.tree_map(lambda x: x[:, b : b + 1], cross)
        cache1 = init_self_cache(cfg.text, 1, T)
        # prefill the prompt on the single row
        lens = jnp.asarray([P], jnp.int32)
        logits = None
        for t in range(P):
            logits, cache1 = prefill_step(
                params["text"], jnp.asarray([prompt_ids[t]], jnp.int32),
                jnp.asarray(t, jnp.int32), cache1, cross_b,
            )
        pw = {"text": params["text"],
              "cross": jax.tree_util.tree_map(lambda x: jnp.repeat(x, num_beams, axis=1), cross_b)}
        seq, n, _ = beam_fn(pw, cache1, logits, lens)
        row = [int(x) for x in np.asarray(seq)[: int(n)]]
        out.append([t for t in row if t != eos_token_id])
    return out


def itm_score_from_embeds(
    params: Params, cfg: BlipConfig,
    image_embeds: jax.Array, text_ids: jax.Array, text_mask: jax.Array,
) -> jax.Array:
    """ITM head on precomputed ViT states (the re-rank path: the ViT runs
    once in extract_features, the fusion MED runs per candidate pair) →
    [B, 2] logits."""
    enc_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
    h = med_forward(
        params["text"], cfg.text, text_ids, text_mask,
        encoder_states=image_embeds, encoder_mask=enc_mask, causal=False,
    )
    cls = h[:, 0]
    return jnp.einsum("bd,od->bo", cls, params["itm_head"]["w"]) + params["itm_head"]["b"]


def itm_score(
    params: Params, cfg: BlipConfig,
    pixels: jax.Array, text_ids: jax.Array, text_mask: jax.Array,
) -> jax.Array:
    """Image-text matching head on the multimodal cls state
    (reference blip_image_text_matching.py 'itm' mode) → [B, 2] logits."""
    enc = vit_forward(params["visual"], cfg.vision, pixels)
    return itm_score_from_embeds(params, cfg, enc, text_ids, text_mask)


def extract_features(
    params: Params, cfg: BlipConfig,
    pixels: Optional[jax.Array] = None,
    text_ids: Optional[jax.Array] = None,
    text_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Unimodal ITC embeddings (reference blip_feature_extractor.py):
    L2-normalized projections of the cls states."""
    out: Dict[str, jax.Array] = {}
    if pixels is not None:
        enc = vit_forward(params["visual"], cfg.vision, pixels)
        v = jnp.einsum("bd,od->bo", enc[:, 0], params["vision_proj"]["w"]) + params["vision_proj"]["b"]
        out["image_embeds"] = enc
        out["image_features"] = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    if text_ids is not None:
        h = med_forward(params["text"], cfg.text, text_ids, text_mask, causal=False)
        t = jnp.einsum("bd,od->bo", h[:, 0], params["text_proj"]["w"]) + params["text_proj"]["b"]
        out["text_embeds"] = h
        out["text_features"] = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    return out


def compute_sim_matrix(
    params: Params, cfg: BlipConfig,
    pixels: jax.Array,          # [Ni, 3, H, W]
    text_ids: jax.Array,        # [Nt, S]
    text_mask: jax.Array,       # [Nt, S]
    *,
    k_test: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(scores_i2t [Ni,Nt], scores_t2i [Nt,Ni]) for RetrievalTask.

    Reference blip_retrieval compute_sim_matrix: ITC feature similarity,
    optionally re-ranked by running the ITM head on the top-k_test pairs
    per row (ITM logit[1] added to the ITC score)."""
    feats = extract_features(
        params, cfg, pixels=pixels, text_ids=text_ids, text_mask=text_mask
    )
    # image_embeds stay ON DEVICE and the ViT never runs again: the re-rank
    # loops fuse precomputed states through one jitted MED program (k is
    # fixed, so each direction compiles once) — the same pattern as
    # albef.compute_sim_matrix
    image_embeds = feats["image_embeds"]
    sims = np.asarray(feats["image_features"]) @ np.asarray(feats["text_features"]).T
    if k_test <= 0:
        return sims, sims.T

    Ni, Nt = sims.shape
    itm = jax.jit(
        lambda p, e, i, m: itm_score_from_embeds(p, cfg, e, i, m)[:, 1]
    )
    k = min(k_test, Nt)
    i2t = np.full_like(sims, -100.0)
    tids, tmask = np.asarray(text_ids), np.asarray(text_mask)
    for i in range(Ni):
        topk = np.argsort(sims[i])[::-1][:k]
        score = np.asarray(itm(
            params, jnp.repeat(image_embeds[i : i + 1], k, axis=0),
            jnp.asarray(tids[topk]), jnp.asarray(tmask[topk]),
        ))
        i2t[i, topk] = sims[i, topk] + score
    kt = min(k_test, Ni)
    t2i = np.full_like(sims.T, -100.0)
    for t in range(Nt):
        topk = np.argsort(sims[:, t])[::-1][:kt]
        score = np.asarray(itm(
            params, image_embeds[np.asarray(topk)],
            jnp.repeat(jnp.asarray(tids[t : t + 1]), kt, axis=0),
            jnp.repeat(jnp.asarray(tmask[t : t + 1]), kt, axis=0),
        ))
        t2i[t, topk] = sims[topk, t] + score
    return i2t, t2i


# ---------------------------------------------------------------------------
# GradCAM (blip_image_text_matching.py compute_gradcam) + sampled captioning
# — the building blocks of the PnP-VQA / Img2Prompt composite models
# ---------------------------------------------------------------------------


def _itm_forward_probed(
    params: Params, cfg: BlipConfig,
    ids: jax.Array, mask: jax.Array,
    enc: jax.Array, probe: jax.Array, block_num: int,
):
    """ITM forward that adds `probe` (zeros) to the cross-attention
    probabilities of layer `block_num` and returns (sum of class-1 logits,
    those probabilities). d(out)/d(probe) is the attention-map gradient the
    torch reference captures with save_attention hooks
    (blip_image_text_matching.py:151-173)."""
    tcfg = cfg.text
    H = tcfg.num_heads
    eps = tcfg.layer_norm_eps
    B, S = ids.shape
    Dh = tcfg.head_dim
    x = med_embed(params["text"], tcfg, ids, jnp.arange(S, dtype=jnp.int32)[None])
    smask = mask[:, None, None, :].astype(bool)
    cams = None
    lp_all = params["text"]["layers"]
    for li in range(tcfg.num_layers):
        lp = {k: jax.tree_util.tree_map(lambda a: a[li], v) for k, v in lp_all.items()}
        a = _mha(_lin(x, lp["sq"]), _lin(x, lp["sk"]), _lin(x, lp["sv"]), H, smask)
        x = layer_norm(x + _lin(a, lp["so"]), lp["s_ln"]["scale"], lp["s_ln"]["bias"], eps)
        # cross attention with probe at the target layer
        q = _lin(x, lp["cq"]).reshape(B, S, H, Dh)
        k = _lin(enc, lp["ck"]).reshape(B, -1, H, Dh)
        v = _lin(enc, lp["cv"]).reshape(B, -1, H, Dh)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (Dh**0.5)
        p = jax.nn.softmax(s, axis=-1)
        if li == block_num:
            p = p + probe
            cams = p
        a = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype).reshape(B, S, -1)
        x = layer_norm(x + _lin(a, lp["co"]), lp["c_ln"]["scale"], lp["c_ln"]["bias"], eps)
        f = _lin(jax.nn.gelu(_lin(x, lp["fc1"]), approximate=False), lp["fc2"])
        x = layer_norm(x + f, lp["f_ln"]["scale"], lp["f_ln"]["bias"], eps)
    itm = (
        jnp.einsum("bd,od->bo", x[:, 0], params["itm_head"]["w"])
        + params["itm_head"]["b"]
    )
    return itm[:, 1].sum(), cams


def compute_gradcam(
    params: Params, cfg: BlipConfig,
    pixels: Optional[jax.Array], text_ids: jax.Array, text_mask: jax.Array,
    *,
    block_num: int = 6,
    enc_states: Optional[jax.Array] = None,
):
    """Per-patch question relevance from the ITM head
    (blip_image_text_matching.py:151-200): gradcam = attn_probs ·
    relu(d itm₁ / d attn_probs), text-masked, head-averaged. Returns
    (avg_gradcam [B, N] — the question-averaged row PnP-VQA samples patches
    from — and the full per-token map [B, S, N])."""
    enc = enc_states if enc_states is not None else vit_forward(
        params["visual"], cfg.vision, pixels
    )
    B, S = text_ids.shape
    H = cfg.text.num_heads
    Se = enc.shape[1]
    probe = jnp.zeros((B, H, S, Se), jnp.float32)

    def f(pr):
        return _itm_forward_probed(params, cfg, text_ids, text_mask, enc, pr, block_num)

    grads, cams = jax.grad(f, has_aux=True)(probe)
    m = text_mask[:, None, :, None].astype(jnp.float32)
    cams = cams[..., 1:] * m          # drop image cls column
    grads = jnp.clip(grads[..., 1:], 0) * m
    gradcam = (cams * grads).mean(axis=1)               # head-avg → [B, S, N]
    tok_len = text_mask.sum(axis=-1) - 2                # minus [ENC], [SEP]
    span = (jnp.arange(S)[None] >= 1) & (jnp.arange(S)[None] <= tok_len[:, None])
    avg = (gradcam * span[..., None]).sum(axis=1) / tok_len[:, None]
    return avg, gradcam


def generate_caption_sampled(
    params: Params, cfg: BlipConfig,
    enc_states: jax.Array,        # [B, Se, D] (e.g. gradcam-sampled patches)
    prompt_ids,                   # list[int] incl. bos
    rng: jax.Array,
    *,
    max_new_tokens: int = 20,
    min_new_tokens: int = 0,
    top_k: int = 50,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    eos_token_id: int = 102,
):
    """Stochastic captioning over caller-provided encoder states — the
    PnP-VQA forward_cap path (pnp_vqa.py:124-160: do_sample with
    top-k/top-p and repetition penalty on HF generate). Returns
    List[List[int]]."""
    from llava_align_tpu.decoding.sampler import sample_token, warp_logits

    B = enc_states.shape[0]
    P = len(prompt_ids)
    T = P + max_new_tokens
    cross = precompute_cross_kv(params["text"], cfg.text, enc_states)
    cache = init_self_cache(cfg.text, B, T)
    step = jax.jit(lambda p, tok, t, c, x: decode_step(p, cfg.text, tok, t, c, x))
    token = np.full((B,), prompt_ids[0], np.int32)
    done = np.zeros((B,), bool)
    generated = [[] for _ in range(B)]
    rows = []
    for t in range(T - 1):
        logits, cache = step(
            params["text"], jnp.asarray(token), jnp.asarray(t, jnp.int32),
            cache, cross,
        )
        if t + 1 < P:
            nxt = np.full((B,), prompt_ids[t + 1], np.int32)
        else:
            lg = np.asarray(logits, np.float32)
            if repetition_penalty != 1.0:
                for b in range(B):
                    seen = set(prompt_ids) | set(generated[b])
                    for tok_id in seen:
                        v = lg[b, tok_id]
                        lg[b, tok_id] = v / repetition_penalty if v > 0 else v * repetition_penalty
            if len(rows) < min_new_tokens:
                lg[:, eos_token_id] = -1e30
            rng, sub = jax.random.split(rng)
            warped = warp_logits(jnp.asarray(lg), top_k=top_k, top_p=top_p)
            nxt = np.asarray(sample_token(sub, warped)).astype(np.int32)
            nxt = np.where(done, eos_token_id, nxt)
            rows.append(nxt)
            for b in range(B):
                if not done[b]:
                    generated[b].append(int(nxt[b]))
            done |= nxt == eos_token_id
        token = nxt
        if t + 1 >= P and done.all():
            break
    out = []
    for b in range(B):
        row = generated[b]
        if eos_token_id in row:
            row = row[: row.index(eos_token_id)]
        out.append(row)
    return out
