"""Beam-search decoding (single-branch) for the DecodeEngine.

Capability parity: the reference's BLIP-2 family generates captions with HF
beam search by default (lavis blip2_vicuna_instruct.py:245 num_beams=5); its
VCD/VDD sampler never combines with beams (it patches `sample` only), so the
contrastive branches are excluded here by design.

TPU-native formulation: beams ride the batch axis of one jitted decode loop —
the cache is reordered per step with a static-shape gather over the beam axis
(cheap at caption-scale prompts), candidate selection is one top_2K over the
flattened [K*V] scores, and the finished-hypothesis heap is a fixed [K] score
buffer merged with each step's eos candidates. Semantics mirror HF
`generate(num_beams=K, do_sample=False, early_stopping=False)`:
scores are summed logprobs, finished hypotheses normalize by
generated_length**length_penalty, eos candidates only finish from the top-K
ranks, and the loop stops when the worst kept hypothesis can no longer be
beaten (tests pin token-exactness against HF generate on shared weights).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1.0e9


def _gather_cache(cache, parents):
    """Reorder cache rows [L, K, S, H, Dh] by beam parent indices."""
    return jax.tree_util.tree_map(
        lambda c: jnp.take(c, parents, axis=1), cache
    )


def make_beam_fn(
    adapter,
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
    min_new_tokens: int = 0,
    attn_impl: str = "auto",
    cache_len: int = 0,
    tp_mesh=None,
):
    """Returns jit-able fn(params, cache_1row, first_logits, lengths_1) →
    (best_seq [T], best_len). The caller prefills ONE row; the fn tiles it.
    min_new_tokens masks eos until that many tokens are generated (HF
    MinNewTokensLengthLogitsProcessor; LAVIS captioning's min_length)."""
    K = num_beams
    T = max_new_tokens
    lp = length_penalty
    min_new = min_new_tokens

    def beam_fn(params, cache1, first_logits, length1):
        # tile the single prefilled row to K beam rows
        cache = jax.tree_util.tree_map(
            lambda c: jnp.repeat(c, K, axis=1), cache1
        )
        lengths = jnp.repeat(length1, K)  # [K]
        logits = jnp.repeat(first_logits, K, axis=0)  # [K, V]
        V = logits.shape[-1]

        init = dict(
            cache=cache,
            lengths=lengths,
            logits=logits,
            seq=jnp.full((K, T), pad_token_id, jnp.int32),
            scores=jnp.where(jnp.arange(K) == 0, 0.0, NEG).astype(jnp.float32),
            fin_scores=jnp.full((K,), NEG, jnp.float32),
            fin_seq=jnp.full((K, T), pad_token_id, jnp.int32),
            fin_len=jnp.zeros((K,), jnp.int32),
            n=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )

        def cond(c):
            return (~c["done"]) & (c["n"] < T)

        def body(c):
            n = c["n"]
            gen_len = (n + 1).astype(jnp.float32)
            logprobs = jax.nn.log_softmax(c["logits"].astype(jnp.float32), axis=-1)
            if min_new > 0:
                eos_col = jnp.arange(V) == eos_token_id
                logprobs = jnp.where(
                    (n < min_new) & eos_col[None, :], NEG, logprobs
                )
            total = c["scores"][:, None] + logprobs  # [K, V]
            vals, idx = jax.lax.top_k(total.reshape(-1), 2 * K)
            tok = (idx % V).astype(jnp.int32)
            parent = idx // V
            is_eos = tok == eos_token_id

            # --- finished candidates: eos within the top-K ranks
            rank = jnp.arange(2 * K)
            cand_fin = jnp.where(
                is_eos & (rank < K), vals / (gen_len**lp), NEG
            )  # [2K]
            cand_seq = jnp.take(c["seq"], parent, axis=0)  # [2K, T] (eos not written)
            merged_scores = jnp.concatenate([c["fin_scores"], cand_fin])
            merged_seq = jnp.concatenate([c["fin_seq"], cand_seq], axis=0)
            merged_len = jnp.concatenate(
                [c["fin_len"], jnp.full((2 * K,), n, jnp.int32)]
            )
            fin_scores, fin_idx = jax.lax.top_k(merged_scores, K)
            fin_seq = jnp.take(merged_seq, fin_idx, axis=0)
            fin_len = jnp.take(merged_len, fin_idx)

            # --- running beams: best K non-eos candidates (vals are sorted)
            run_vals = jnp.where(is_eos, NEG, vals)
            new_scores, sel = jax.lax.top_k(run_vals, K)
            parents = jnp.take(parent, sel)
            toks = jnp.take(tok, sel)
            seq = jnp.take(c["seq"], parents, axis=0)
            seq = jax.lax.dynamic_update_slice(seq, toks[:, None], (0, n))
            cache = _gather_cache(c["cache"], parents)

            # --- stop: K hypotheses held and none improvable
            # (HF BeamHypotheses.is_done, early_stopping=False)
            n_fin = jnp.sum(fin_scores > NEG / 2)
            worst_fin = fin_scores[K - 1]
            best_attainable = new_scores[0] / (gen_len**lp)
            done = (n_fin >= K) & (worst_fin >= best_attainable)

            # --- one decode step for the selected beams
            emb = adapter.embed_tokens(params, toks[:, None])
            hidden, cache = adapter.forward(
                params, emb, c["lengths"][:, None], cache, c["lengths"],
                attn_impl=attn_impl, max_seq_len=cache_len, tp_mesh=tp_mesh,
            )
            logits = adapter.logits(params, hidden[:, 0])

            return dict(
                cache=cache, lengths=c["lengths"] + 1, logits=logits, seq=seq,
                scores=new_scores, fin_scores=fin_scores, fin_seq=fin_seq,
                fin_len=fin_len, n=n + 1, done=done,
            )

        f = jax.lax.while_loop(cond, body, init)

        # finalize: running beams compete with the finished heap
        # (HF finalize adds running hyps when not done)
        run_norm = f["scores"] / (jnp.maximum(f["n"], 1).astype(jnp.float32) ** lp)
        run_norm = jnp.where(f["done"], NEG, run_norm)
        all_scores = jnp.concatenate([f["fin_scores"], run_norm])
        all_seq = jnp.concatenate([f["fin_seq"], f["seq"]], axis=0)
        all_len = jnp.concatenate(
            [f["fin_len"], jnp.full((K,), f["n"], jnp.int32)]
        )
        best = jnp.argmax(all_scores)
        return all_seq[best], all_len[best], all_scores[best]

    return beam_fn
