"""GPT-2 decoder + GPT-dialogue (video-conditioned) model.

Capability parity: the reference's LAVIS GPT-dialogue family
(lavis/models/gpt_models/gpt_dialogue.py — a GPT2LMHeadModel subclass with a
video-feature prefix projected by `video_ff`, token-type embeddings drawn
from the word table, a shifted LM loss with ignore_index=-1, and a shifted
MSE video-reconstruction loss through `video_ff_out`). The reference's own
experiments never execute it (SURVEY §2.4 model-zoo row); provided for zoo
completeness.

TPU-first: stacked [L, ...] layer params under lax.scan for the full pass,
fp32 softmax/LN, a [L, B, S, H, Dh] KV cache with a per-step decode for
greedy generation. Weight layout note: HF GPT-2 stores Conv1D weights as
[in, out] — the converter transposes to the [out, in] used everywhere else
in this repo.
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


@dataclasses.dataclass(frozen=True)
class Gpt2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_dim(self) -> int:
        return 4 * self.hidden_size

    @staticmethod
    def tiny(vocab_size: int = 64) -> "Gpt2Config":
        return Gpt2Config(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=4,
            max_position_embeddings=64,
        )


def init(rng: jax.Array, cfg: Gpt2Config) -> Params:
    ks = iter(jax.random.split(rng, 12))
    D, F, L, V = cfg.hidden_size, cfg.ffn_dim, cfg.num_layers, cfg.vocab_size

    def w(shape, fan):
        return (jax.random.normal(next(ks), shape, jnp.float32) / fan**0.5).astype(cfg.dtype)

    def lin(o, i):
        return {"w": w((L, o, i), i), "b": jnp.zeros((L, o), cfg.dtype)}

    def ln():
        return {"scale": jnp.ones((L, D), cfg.dtype), "bias": jnp.zeros((L, D), cfg.dtype)}

    return {
        "wte": w((V, D), D),
        "wpe": w((cfg.max_position_embeddings, D), D),
        "layers": {
            "ln1": ln(), "qkv": lin(3 * D, D), "o": lin(D, D),
            "ln2": ln(), "fc1": lin(F, D), "fc2": lin(D, F),
        },
        "ln_f": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
    }


def _lin(h, p):
    return jnp.einsum("...d,od->...o", h, p["w"], preferred_element_type=h.dtype) + p["b"]


def _gelu_new(x):
    return jax.nn.gelu(x, approximate=True)


def forward(
    params: Params,
    cfg: Gpt2Config,
    input_embeds: jax.Array,                  # [B, S, D]
    attention_mask: Optional[jax.Array] = None,   # [B, S] 1=attend
    position_ids: Optional[jax.Array] = None,     # [B, S]
) -> jax.Array:
    """Full causal pass → hidden [B, S, D] (post ln_f)."""
    B, S, D = input_embeds.shape
    H = cfg.num_heads
    eps = cfg.layer_norm_eps
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    x = input_embeds + params["wpe"][position_ids]

    mask = jnp.tril(jnp.ones((S, S), bool))[None, None]
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :].astype(bool)

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        qkv = _lin(h, lp["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        Dh = D // H
        s = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.reshape(B, S, H, Dh), k.reshape(B, S, H, Dh),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (Dh**0.5)
        s = jnp.where(mask, s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v.dtype), v.reshape(B, S, H, Dh),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype).reshape(B, S, D)
        x = x + _lin(a, lp["o"])
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        x = x + _lin(_gelu_new(_lin(h, lp["fc1"])), lp["fc2"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"], eps)


def logits(params: Params, hidden: jax.Array) -> jax.Array:
    """Tied lm_head (HF GPT2LMHeadModel ties lm_head to wte)."""
    return jnp.einsum(
        "...d,vd->...v", hidden, params["wte"], preferred_element_type=jnp.float32
    )


def embed(params: Params, ids: jax.Array) -> jax.Array:
    return params["wte"][ids]


# ---------------------------------------------------------------------------
# incremental decoding
# ---------------------------------------------------------------------------


def init_cache(cfg: Gpt2Config, batch: int, max_len: int) -> Dict[str, jax.Array]:
    shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def decode_step(
    params: Params, cfg: Gpt2Config,
    emb: jax.Array,             # [B, D] current-position input embedding
    t: jax.Array,               # scalar int32 position
    cache: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One causal step → (logits [B, V], cache)."""
    B, D = emb.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    Smax = cache["k"].shape[2]
    x = (emb + params["wpe"][t])[:, None]       # [B, 1, D]
    smask = (jnp.arange(Smax) <= t)[None, None, None, :]

    kc, vc = cache["k"], cache["v"]
    lp = params["layers"]
    for li in range(cfg.num_layers):
        l = {k: jax.tree_util.tree_map(lambda a: a[li], v) for k, v in lp.items()}
        h = layer_norm(x, l["ln1"]["scale"], l["ln1"]["bias"], eps)
        q, k_new, v_new = jnp.split(_lin(h, l["qkv"]), 3, axis=-1)
        kc = kc.at[li, :, t].set(k_new[:, 0].reshape(B, H, Dh))
        vc = vc.at[li, :, t].set(v_new[:, 0].reshape(B, H, Dh))
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q.reshape(B, 1, H, Dh), kc[li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (Dh**0.5)
        s = jnp.where(smask, s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(vc.dtype), vc[li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype).reshape(B, 1, D)
        x = x + _lin(a, l["o"])
        h = layer_norm(x, l["ln2"]["scale"], l["ln2"]["bias"], eps)
        x = x + _lin(_gelu_new(_lin(h, l["fc1"])), l["fc2"])

    h = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"], eps)
    return logits(params, h[:, 0]), {"k": kc, "v": vc}


# ---------------------------------------------------------------------------
# GPT-dialogue (gpt_dialogue.py capability)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GptDialogueConfig:
    gpt: Gpt2Config = dataclasses.field(default_factory=Gpt2Config)
    len_video_ft: int = 4224

    @staticmethod
    def tiny(vocab_size: int = 64, len_video_ft: int = 8) -> "GptDialogueConfig":
        return GptDialogueConfig(
            gpt=Gpt2Config.tiny(vocab_size), len_video_ft=len_video_ft
        )


def dialogue_init(rng: jax.Array, cfg: GptDialogueConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    D, Fv = cfg.gpt.hidden_size, cfg.len_video_ft
    dt = cfg.gpt.dtype

    def w(key, o, i):
        return (jax.random.normal(key, (o, i), jnp.float32) / i**0.5).astype(dt)

    return {
        "gpt": init(k1, cfg.gpt),
        "video_ff": {"w": w(k2, D, Fv), "b": jnp.zeros((D,), dt)},
        "video_ff_out": {"w": w(k3, Fv, D), "b": jnp.zeros((Fv,), dt)},
    }


def dialogue_forward(
    params: Params, cfg: GptDialogueConfig,
    input_ids: jax.Array,        # [B, St]
    video_fts: jax.Array,        # [B, Sv, len_video_ft]
    attn_mask: Optional[jax.Array] = None,      # [B, Sv+St]
    token_type_ids: Optional[jax.Array] = None, # [B, Sv+St] (wte-indexed)
    labels: Optional[jax.Array] = None,         # [B, Sv+St], -1 = ignore
) -> Dict[str, jax.Array]:
    """gpt_dialogue.py:36-104: video prefix → LM logits (+ LM CE with
    ignore_index=-1 and shifted video-MSE reconstruction when labels given)."""
    g = params["gpt"]
    emb = jnp.concatenate(
        [_lin(video_fts.astype(g["wte"].dtype), params["video_ff"]), embed(g, input_ids)],
        axis=1,
    )
    if token_type_ids is not None:
        emb = emb + embed(g, token_type_ids)  # HF GPT2 uses wte for token types
    hidden = forward(g, cfg.gpt, emb, attention_mask=attn_mask)
    lm_logits = logits(g, hidden)
    out: Dict[str, jax.Array] = {"logits": lm_logits, "hidden": hidden}

    loss = None
    if labels is not None:
        lg = lm_logits[:, :-1]
        lb = labels[:, 1:]
        valid = lb != -1
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.clip(lb, 0, cfg.gpt.vocab_size - 1)[..., None], axis=-1
        )[..., 0]
        loss = jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)

    sv = video_fts.shape[1]
    video_logits = _lin(hidden[:, :sv], params["video_ff_out"])
    video_loss = jnp.mean(
        (video_logits[:, :-1].astype(jnp.float32) - video_fts[:, 1:].astype(jnp.float32)) ** 2
    )
    loss = video_loss if loss is None else loss + video_loss
    out["loss"] = loss
    out["video_loss"] = video_loss
    return out


def dialogue_generate(
    params: Params, cfg: GptDialogueConfig,
    input_ids: np.ndarray,       # [B, St] prompt
    video_fts: np.ndarray,       # [B, Sv, len_video_ft]
    *,
    max_new_tokens: int = 20,
    eos_token_id: Optional[int] = None,
) -> np.ndarray:
    """Greedy continuation after the video+text prefix via the KV-cache
    decode path (the reference decodes with HF GPT2 generate)."""
    g = params["gpt"]
    B, St = input_ids.shape
    Sv = video_fts.shape[1]
    T = Sv + St + max_new_tokens
    prefix = jnp.concatenate(
        [_lin(jnp.asarray(video_fts, g["wte"].dtype), params["video_ff"]),
         embed(g, jnp.asarray(input_ids))],
        axis=1,
    )
    cache = init_cache(cfg.gpt, B, T)
    step = jax.jit(lambda p, e, t, c: decode_step(p, cfg.gpt, e, t, c))
    lg = None
    for t in range(Sv + St):
        lg, cache = step(g, prefix[:, t], jnp.asarray(t, jnp.int32), cache)
    out_tokens = []
    done = np.zeros((B,), bool)
    tok = np.asarray(lg).argmax(-1).astype(np.int32)
    for t in range(Sv + St, T):
        if eos_token_id is not None:
            tok = np.where(done, eos_token_id, tok)
        out_tokens.append(tok)
        done |= (tok == eos_token_id) if eos_token_id is not None else False
        if done.all() or t == T - 1:
            break
        lg, cache = step(g, embed(g, jnp.asarray(tok)), jnp.asarray(t, jnp.int32), cache)
        tok = np.asarray(lg).argmax(-1).astype(np.int32)
    return np.stack(out_tokens, axis=1) if out_tokens else np.zeros((B, 0), np.int32)
