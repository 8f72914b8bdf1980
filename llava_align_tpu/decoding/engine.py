"""TPU-native debiased decode engine.

Replaces the reference's monkey-patched HF sampler (vcd_utils/vcd_sample.py:25-326)
with a first-class engine. Per generated token the reference runs 2-3
*sequential* HF forwards — one per contrast branch, each owning a python-side
KV cache (vcd_sample.py:109-114,163-168,178-183,269-277). Here all branches
live on the batch axis of ONE jitted forward and ONE packed KV cache, and the
whole decode loop (forward → fuse → warp → sample → stop-check) runs on device
inside `lax.while_loop` — zero host round-trips per token.

Branch semantics (exact reference behavior, vcd_sample.py:147-185):
    main            full visual input
    'unk'           degraded-token branch (model-specific; llava: sentinel→0)
    'none'          visual positions physically removed (here: a genuinely
                    shorter row, right-padded, masked by length)
    'cd'            same tokens, diffusion-noised image (VCD)
Contrast logits = the primary branch, or the mean of (primary, 'none') when
both use_dd and use_dd_unk are set.

The engine is model-family-agnostic via `decoding.adapters`.

Deliberate divergence: the reference's monkey-patch only replaces HF `sample`,
so `do_sample=False` silently falls through to un-patched greedy_search and
LOSES the contrastive correction; here CD applies under greedy decoding too
(a strict superset — greedy+CD is the temperature→0 limit of the patched
sampler).
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Sequence

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding import sampler as S
from llava_align_tpu.decoding.adapters import LlavaAdapter, UNK_TOKEN_ID  # noqa: F401
from llava_align_tpu.models import llava as llava_model
from llava_align_tpu.ops.noise import add_diffusion_noise

Params = Dict[str, Any]

logger = logging.getLogger("llava_align_tpu.engine")


def branch_kinds(gen: GenerationConfig) -> List[str]:
    """Row layout of the packed branch axis (row 0 = main).

    Mirrors the reference's if/elif chain (vcd_sample.py:147-161) plus the
    dual-dd extra forward (:171-177): the primary contrast branch is cd > unk >
    none by priority; a secondary 'none' branch exists iff use_dd AND
    use_dd_unk."""
    kinds = ["main"]
    if gen.use_cd:
        kinds.append("cd")
    elif gen.use_dd_unk:
        kinds.append("unk")
    elif gen.use_dd:
        kinds.append("none")
    if gen.use_dd and gen.use_dd_unk:
        kinds.append("none")
    return kinds


def branch_token_ids(input_ids: Sequence[int], kind: str) -> List[int]:
    """LLaVA-family branch degradation (kept for compatibility; adapters own
    this per family)."""
    return LlavaAdapter.branch_token_ids(None, input_ids, kind)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flatten_blob(arrs):
    """Concatenate host pack arrays into ONE int32 transfer buffer.

    The remote device stream charges ~5ms latency per input transfer
    (measured: 15 small pack transfers cost ~80ms serialized before the
    program runs); one blob costs one. Returns (blob, spec) — spec is fully
    determined by the compile key's shape parameters, so a cached program's
    closure-captured spec always matches later calls with the same key."""
    spec = tuple((tuple(a.shape), str(np.asarray(a).dtype)) for a in arrs)
    parts = [np.asarray(a, dtype=np.int32).ravel() for a in arrs]
    blob = np.concatenate(parts) if parts else np.zeros((0,), np.int32)
    return blob, spec


def _unflatten_blob(blob, spec):
    """Inverse of _flatten_blob inside jit: static slices, free at runtime."""
    out, off = [], 0
    for shape, dt in spec:
        n = int(np.prod(shape, dtype=np.int64))
        x = jax.lax.slice_in_dim(blob, off, off + n, axis=0).reshape(shape)
        if dt == "bool":
            x = x.astype(jnp.bool_)
        out.append(x)
        off += n
    return out


def _make_fuse_and_warp(gen: GenerationConfig, n_contrast: int):
    """[Q, nb, V] branch logits → warped [Q, V] (reference fusion chain,
    vcd_sample.py:171-194 + HF warper order)."""

    def fuse_and_warp(branch_logits: jax.Array) -> jax.Array:
        main = branch_logits[:, 0]
        if n_contrast:
            contrast = jnp.mean(branch_logits[:, 1 : 1 + n_contrast], axis=1)
            fused = S.fuse_contrastive_logits(main, contrast, gen.cd_alpha, gen.cd_beta)
        else:
            fused = main
        return S.warp_logits(fused, gen.temperature, gen.top_k, gen.top_p)

    return fuse_and_warp


def _make_stop_hit(kws, Q: int):
    """Per-question stop-keyword suffix matcher over [Q, T] output buffers."""

    def stop_hit(out_buf: jax.Array, n: jax.Array) -> jax.Array:
        done = jnp.zeros((Q,), bool)
        for kw in kws:
            m = len(kw)
            start = jnp.maximum(n - m, 0)
            window = jax.lax.dynamic_slice_in_dim(out_buf, start, m, axis=1)
            done |= jnp.all(window == jnp.asarray(kw), axis=1) & (n >= m)
        return done

    return stop_hit


@dataclasses.dataclass
class GenerationOutput:
    token_ids: List[int]              # generated ids (trimmed at stop)
    num_generated: int
    first_scores_top_probs: np.ndarray  # [k] softmax of first-step warped scores
    first_scores_top_ids: np.ndarray    # [k]
    prompt_length: int                  # main-branch spliced length


class DecodeEngine:
    """Compiles and runs debiased generation for one (model, GenerationConfig).

    Prefill lengths are bucketed to multiples of `bucket` so the number of
    compiled programs stays small across a dataset sweep; compiles are logged
    and capped at `max_compiled` distinct programs (exceeding the cap warns —
    it means bucketing is not holding and a sweep is silently re-jitting).

    `mesh`: optional jax.sharding.Mesh with ('data', 'model') axes. When set,
    params are placed with the adapter's Megatron TP shardings, the KV cache
    is sharded (kv heads over 'model', batch rows over 'data' when divisible),
    and the whole jitted generate runs SPMD over the mesh — the TPU-native
    replacement for the reference's device_map='auto' multi-GPU placement and
    synced_gpus lockstep (reference builder.py:27, vcd_sample.py:94-102).
    13B-bf16 (>1 chip of HBM) decodes via TP; lockstep batches fan out via DP.
    """

    def __init__(
        self,
        params: Params,
        cfg: LlavaConfig,
        gen: GenerationConfig,
        *,
        adapter=None,
        stop_keyword_ids: Optional[Sequence[Sequence[int]]] = None,
        attn_impl: str = "auto",
        bucket: int = 128,
        top_scores_k: int = 100,
        mesh: Optional[Mesh] = None,
        max_compiled: int = 16,
        act_quant: bool = False,
        kv_quant: Optional[str] = None,
    ):
        self.cfg = cfg
        self.adapter = adapter if adapter is not None else LlavaAdapter(cfg)
        if kv_quant:
            if kv_quant != "int8":
                raise ValueError(f"unknown kv_quant mode {kv_quant!r}")
            # Opt-in int8 KV cache: halves decode-time cache HBM reads at
            # ~1/256 relative quantization error (models/llama.init_cache
            # kv_quant; shared prefix segments quantize too). Same adapter
            # compile-time-constant pattern as act_quant below.
            if not getattr(type(self.adapter), "supports_kv_quant", False):
                logger.warning(
                    "kv_quant requested but adapter %s has no int8 cache "
                    "path; ignoring.", getattr(self.adapter, "name", "?"),
                )
            else:
                self.adapter = copy.copy(self.adapter)
                self.adapter.kv_quant = True
        if act_quant:
            # Opt-in W8A8: compute-bound int8 matmuls take the int8-MXU path
            # with dynamic activation quant (~1.4x prefill, not bit-exact;
            # ops/quant W8A8 note). A compile-time constant on the adapter so
            # no call signature changes; decode rows stay on the exact
            # weight-streaming kernels either way.
            if not getattr(type(self.adapter), "supports_act_quant", False):
                # hasattr is NOT the right test: subclasses (llava_mpt,
                # blip2_opt) inherit the attribute but override forward()
                # without the act_quant kwarg
                logger.warning(
                    "act_quant requested but adapter %s has no W8A8 path; "
                    "ignoring.", getattr(self.adapter, "name", "?"),
                )
            else:
                # copy before flagging: the caller's adapter instance may be
                # shared with engines that did NOT opt into W8A8
                self.adapter = copy.copy(self.adapter)
                self.adapter.act_quant = True
        self.gen = gen
        self.kinds = branch_kinds(gen)
        self.stop_keyword_ids = [list(map(int, k)) for k in (stop_keyword_ids or [])]
        self.attn_impl = attn_impl
        self.bucket = bucket
        self.top_scores_k = top_scores_k
        self.mesh = mesh
        self.max_compiled = max_compiled
        self._compiled: Dict[Any, Any] = {}
        if mesh is not None:
            self._replicated = NamedSharding(mesh, P())
            self._model_size = int(mesh.shape.get("model", 1))
            self._data_size = int(mesh.shape.get("data", 1))
            self._kv_shardable = (
                self._model_size > 1
                and self.adapter.num_kv_heads % self._model_size == 0
            )
            has_quant = any(
                isinstance(v, dict) and "q" in v and "s" in v
                for v in jax.tree_util.tree_leaves(
                    params, is_leaf=lambda x: isinstance(x, dict) and "q" in x and "s" in x
                )
            )
            tp_ready = getattr(self.adapter, "int8_tp_ready", lambda *a: False)
            if (
                self._model_size > 1
                and has_quant
                and not tp_ready(params, self._model_size)
            ):
                # Misaligned int8 stacks (7B gateup/down at TP=8): bit-inert
                # lane padding may unlock the shard_map TP path. Only keep the
                # padded tree if it actually makes the model TP-ready.
                pad = getattr(self.adapter, "int8_tp_pad", None)
                if pad is not None:
                    padded = pad(params, self._model_size)
                    if padded is not params and tp_ready(padded, self._model_size):
                        params = padded
            self._int8_tp = (
                self._model_size > 1
                and has_quant
                and tp_ready(params, self._model_size)
            )
            shardings = self.adapter.param_shardings(params, mesh)
            self.params = jax.device_put(params, shardings)
            if self._model_size > 1 and has_quant and not self._int8_tp:
                # GSPMD cannot partition the Pallas custom call, and this
                # model's shard dims are not lane-aligned for the explicit
                # shard_map TP path — int8 stacks stay replicated: correct,
                # but no TP memory scaling. Use bf16 params or an aligned
                # model-axis size (int8_tp_aligned).
                logger.warning(
                    "int8-quantized stacks are replicated across the %d-way "
                    "'model' axis (per-shard dims not lane-aligned for the "
                    "shard_map TP kernels); TP shards only the bf16 tensors.",
                    self._model_size,
                )
            has_quant4 = any(
                isinstance(v, dict) and "q4" in v and "gs" in v
                for v in jax.tree_util.tree_leaves(
                    params,
                    is_leaf=lambda x: isinstance(x, dict) and "q4" in x and "gs" in x,
                )
            )
            if self._model_size > 1 and has_quant4:
                # int4 group scales live inside the contraction, so there is
                # no shard_map TP formulation yet — replicated is correct but
                # unscaled; int4 is a single-chip serving config.
                logger.warning(
                    "int4-quantized stacks are replicated across the %d-way "
                    "'model' axis (no int4 TP kernel); use int8 for TP "
                    "serving.", self._model_size,
                )
        else:
            self.params = params
            self._int8_tp = False
        self._tp_mesh = mesh if getattr(self, "_int8_tp", False) else None

    # ------------------------------------------------------------------
    # mesh helpers
    # ------------------------------------------------------------------

    def _put(self, x):
        """Commit host inputs replicated over the mesh (no-op single device)."""
        return jax.device_put(x, self._replicated) if self.mesh is not None else x

    def _constrain_cache(self, cache, batch_rows: int):
        """Anchor the KV cache layout: [L, B, Smax, K, Dh] with kv heads over
        'model' (TP) and rows over 'data' when the packed row count divides —
        without this GSPMD may replicate the GB-scale cache on every chip."""
        if self.mesh is None:
            return cache
        kv = "model" if self._kv_shardable else None
        rows = (
            "data"
            if self._data_size > 1 and batch_rows % self._data_size == 0
            else None
        )
        ns = NamedSharding(self.mesh, P(None, rows, None, kv, None))
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, ns), cache
        )

    def _register(self, key, fn):
        self._compiled[key] = fn
        n = len(self._compiled)
        logger.info("engine compile #%d: key=%s", n, key)
        if n > self.max_compiled:
            logger.warning(
                "engine compiled %d distinct programs (cap %d) — prompt-length "
                "bucketing is not holding; raise `bucket` or audit the sweep",
                n, self.max_compiled,
            )
        return fn

    # ------------------------------------------------------------------
    # host-side packing
    # ------------------------------------------------------------------

    def _pack(
        self,
        input_ids: Sequence[int],
        has_image: bool,
        branch_ids: Optional[Mapping[str, Sequence[int]]] = None,
        num_image_tokens: Optional[int] = None,
        kinds: Optional[Sequence[str]] = None,
    ):
        n_img = (
            (num_image_tokens or self.adapter.num_image_tokens) if has_image else 0
        )
        branch_ids = branch_ids or {}
        per_branch = []
        for kind in (kinds if kinds is not None else self.kinds):
            if kind in branch_ids:
                ids = [int(t) for t in branch_ids[kind]]
            else:
                ids = self.adapter.branch_token_ids(input_ids, kind)
            n = n_img if kind in ("main", "cd") else 0
            per_branch.append((kind, ids, n))
        max_len = max(
            len(ids) + (n - 1) * sum(1 for t in ids if t == IMAGE_TOKEN_INDEX)
            if n
            else len(ids)
            for _, ids, n in per_branch
        )
        pad_to = _round_up(max(max_len, self.bucket), self.bucket)

        nb = len(per_branch)
        tokens = np.zeros((nb, pad_to), np.int32)
        tok_g = np.zeros((nb, pad_to), np.int32)
        img_g = np.zeros((nb, pad_to), np.int32)
        is_img = np.zeros((nb, pad_to), bool)
        lengths = np.zeros((nb,), np.int32)
        feats_src = np.full((nb,), -1, np.int32)  # -1 = no image features
        for b, (kind, ids, n) in enumerate(per_branch):
            plan = llava_model.plan_splice(ids, n, pad_to)
            tokens[b, : len(plan.tokens)] = plan.tokens
            tok_g[b] = plan.tok_gather
            img_g[b] = plan.img_gather
            is_img[b] = plan.is_image
            lengths[b] = plan.length
            if kind == "main" and has_image:
                feats_src[b] = 0
            elif kind == "cd":
                feats_src[b] = 1
        return pad_to, tokens, tok_g, img_g, is_img, lengths, feats_src

    def _assemble_images(self, imgs_np, count: int) -> np.ndarray:
        """Per-slot [3,H,W] images (or None) → one [count, 3, H, H] array.
        Raw uint8 ships only when every present slot is uint8 AND no cd run
        needs a normalized-space zero placeholder (a missing slot's zeros
        must mean 'zero in normalized space')."""
        H = self.adapter.image_size
        use_u8 = (
            any(i is not None for i in imgs_np)
            and all(i is None or i.dtype == np.uint8 for i in imgs_np)
            and not (self.gen.use_cd and any(i is None for i in imgs_np))
        )
        dtype = np.uint8 if use_u8 else np.float32
        images = np.zeros((count, 3, H, H), dtype)
        for qi, im in enumerate(imgs_np):
            if im is None:
                continue
            if im.dtype == np.uint8 and not use_u8:
                from llava_align_tpu.ops.image import normalize_host

                im = normalize_host(im)
            images[qi] = im.astype(dtype)
        return images

    # ------------------------------------------------------------------
    # jitted generate
    # ------------------------------------------------------------------

    @property
    def img_kinds(self) -> List[str]:
        """Image-bearing branches — always a prefix of self.kinds."""
        return [k for k in self.kinds if k in ("main", "cd")]

    @property
    def txt_kinds(self) -> List[str]:
        return [k for k in self.kinds if k not in ("main", "cd")]

    def _get_fn(self, pad_img: int, pad_txt: int, precomputed_feats: bool = False,
                spec: tuple = ()):
        """Split-bucket prefill: the image-bearing branches (≥576 image tokens)
        and the text-only degraded branches (~10% the length) prefill as two
        forwards at their own buckets into disjoint rows of one cache —
        uniform padding would waste ~60% of prefill FLOPs on the padded text
        rows. Decode then runs on the packed rows as usual."""
        key = (pad_img, pad_txt, precomputed_feats)
        if key in self._compiled:
            return self._compiled[key]

        adapter, gen = self.adapter, self.gen
        nb = len(self.kinds)
        n_img_rows = len(self.img_kinds)
        n_txt_rows = len(self.txt_kinds)
        n_contrast = nb - 1
        T = gen.max_new_tokens
        cache_len = max(pad_img, pad_txt) + T
        kws = [np.asarray(k, np.int32) for k in self.stop_keyword_ids if 0 < len(k) <= T]
        attn_impl = self.attn_impl
        topk = self.top_scores_k

        # the shared factories at Q=1 — ONE fusion chain / stop matcher for
        # the single, batch and grouped paths (they must never drift apart)
        _fuse_q1 = _make_fuse_and_warp(gen, n_contrast)
        _stop_q1 = _make_stop_hit(kws, 1)

        def fuse_and_warp(branch_logits: jax.Array) -> jax.Array:
            return _fuse_q1(branch_logits[None])[0]  # [nb, V] -> [V]

        def stop_hit(out_buf: jax.Array, n: jax.Array) -> jax.Array:
            return _stop_q1(out_buf[None], n)[0]

        def generate_fn(params, blob, images, rng):
            xs = _unflatten_blob(blob, spec)
            pack_img, pack_txt = tuple(xs[0:6]), tuple(xs[6:12])
            tokens, tok_g, img_g, is_img, len_img, feats_src = pack_img
            # ---- vision encode (main + optional noised copy, one tower call)
            if precomputed_feats:
                feats = images  # already [n_srcs, N, D]
            else:
                from llava_align_tpu.ops.image import normalize_device

                # uint8 pixels normalize on device (4x less transfer)
                images = normalize_device(images, adapter.vision_dtype)
                # images [G, 3, H, W]: G > 1 = anyres grid stack whose
                # features concatenate into one long image-token run
                G = images.shape[0]
                if gen.use_cd:
                    rng, rng_noise = jax.random.split(rng)
                    noised = add_diffusion_noise(images, rng_noise, gen.noise_step)
                    imgs = jnp.concatenate([images, noised], axis=0)
                else:
                    imgs = images
                grid_feats = adapter.encode_images(params, imgs)  # [G(2G), N0, D]
                D = grid_feats.shape[2]
                rows = [grid_feats[:G].reshape(1, -1, D)]
                if gen.use_cd:
                    rows.append(grid_feats[G:].reshape(1, -1, D))
                feats = jnp.concatenate(rows, axis=0)  # [n_srcs, G*N0, D]
            N, D = feats.shape[1], feats.shape[2]
            feats_ext = jnp.concatenate(
                [jnp.zeros((1, N, D), feats.dtype), feats], axis=0
            )
            branch_feats = feats_ext[feats_src + 1]  # [n_img_rows, N, D]

            # ---- prefill: image rows at their bucket...
            cache = self._constrain_cache(adapter.init_cache(nb, cache_len), nb)
            embeds = adapter.splice_embeds(params, tokens, tok_g, img_g, is_img, branch_feats)
            positions = jnp.broadcast_to(
                jnp.arange(pad_img, dtype=jnp.int32), (n_img_rows, pad_img)
            )
            hidden, cache = adapter.forward(
                params, embeds, positions, cache,
                jnp.zeros((n_img_rows,), jnp.int32), attn_impl=attn_impl,
                max_seq_len=cache_len, tp_mesh=self._tp_mesh,
            )
            last_hidden = hidden[jnp.arange(n_img_rows), len_img - 1]
            logits = adapter.logits(params, last_hidden)
            lengths = len_img

            # ---- ...and text-only degraded rows at theirs (much shorter)
            if n_txt_rows:
                t_tokens, t_tok_g, t_img_g, t_is_img, len_txt, _ = pack_txt
                zero_feats = jnp.zeros((n_txt_rows, 1, D), feats.dtype)
                t_embeds = adapter.splice_embeds(
                    params, t_tokens, t_tok_g, t_img_g, t_is_img, zero_feats
                )
                t_positions = jnp.broadcast_to(
                    jnp.arange(pad_txt, dtype=jnp.int32), (n_txt_rows, pad_txt)
                )
                t_hidden, cache = adapter.forward(
                    params, t_embeds, t_positions, cache,
                    jnp.zeros((n_txt_rows,), jnp.int32), attn_impl=attn_impl,
                    max_seq_len=cache_len, cache_row_offset=n_img_rows,
                    tp_mesh=self._tp_mesh,
                )
                t_last = t_hidden[jnp.arange(n_txt_rows), len_txt - 1]
                logits = jnp.concatenate(
                    [logits, adapter.logits(params, t_last)], axis=0
                )
                lengths = jnp.concatenate([len_img, len_txt], axis=0)

            # ---- on-device decode loop
            V = logits.shape[-1]
            init = dict(
                cache=cache,
                lengths=lengths,
                logits=logits,
                out_buf=jnp.zeros((T,), jnp.int32),
                first_scores=jnp.zeros((V,), jnp.float32),
                n=jnp.asarray(0, jnp.int32),
                done=jnp.asarray(False),
                rng=rng,
            )

            def cond(c):
                return (~c["done"]) & (c["n"] < T)

            def body(c):
                warped = fuse_and_warp(c["logits"])
                first_scores = jnp.where(c["n"] == 0, warped, c["first_scores"])
                rng, sub = jax.random.split(c["rng"])
                tok = S.sample_token(sub, warped, gen.do_sample).astype(jnp.int32)
                out_buf = jax.lax.dynamic_update_slice(c["out_buf"], tok[None], (c["n"],))
                n = c["n"] + 1
                done = (tok == gen.eos_token_id) | stop_hit(out_buf, n) | (n >= T)

                # No lax.cond skip for the final step's forward: both cond
                # branches carrying the GB-scale cache force XLA to reserve
                # duplicate buffers; one wasted trailing forward is cheaper.
                emb = adapter.embed_tokens(params, jnp.broadcast_to(tok, (nb, 1)))
                hidden, cache = adapter.forward(
                    params, emb, c["lengths"][:, None], c["cache"], c["lengths"],
                    attn_impl=attn_impl, max_seq_len=cache_len,
                    tp_mesh=self._tp_mesh,
                )
                logits = adapter.logits(params, hidden[:, 0])
                return dict(
                    cache=cache, lengths=c["lengths"] + 1, logits=logits,
                    out_buf=out_buf, first_scores=first_scores, n=n, done=done,
                    rng=rng,
                )

            final = jax.lax.while_loop(cond, body, init)
            probs = jax.nn.softmax(final["first_scores"], axis=-1)
            top_probs, top_ids = jax.lax.top_k(probs, min(topk, V))
            return final["out_buf"], final["n"], top_probs, top_ids

        return self._register(key, jax.jit(generate_fn))

    # ------------------------------------------------------------------
    # batched multi-question generation (throughput path)
    # ------------------------------------------------------------------

    def _get_batch_fn(self, pad_img: int, pad_txt: int, Q: int,
                      spec: tuple = ()):
        """Lockstep multi-question decode with split-bucket prefill.

        Cache rows are grouped [all image-bearing rows | all text-only rows]
        (not interleaved per question): the image group prefills at its own
        bucket and the text group at its (≈8× smaller) bucket — the same
        ~60% prefill-FLOPs saving the single-question path gets. A static
        permutation restores question-major [Q, nb] order for logit fusion.
        """
        key = ("batch", pad_img, pad_txt, Q)
        if key in self._compiled:
            return self._compiled[key]

        adapter, gen = self.adapter, self.gen
        nb = len(self.kinds)
        n_img = len(self.img_kinds)
        n_txt = len(self.txt_kinds)
        R = Q * nb
        n_contrast = nb - 1
        T = gen.max_new_tokens
        cache_len = max(pad_img, pad_txt) + T
        kws = [np.asarray(k, np.int32) for k in self.stop_keyword_ids if 0 < len(k) <= T]
        attn_impl = self.attn_impl
        topk = self.top_scores_k

        # cache-row layout: image rows [q * n_img + i], text rows
        # [Q*n_img + q * n_txt + j]. perm[q*nb + b] = that branch's cache row.
        perm = np.zeros((R,), np.int32)
        for q in range(Q):
            i = j = 0
            for b, kind in enumerate(self.kinds):
                if kind in ("main", "cd"):
                    perm[q * nb + b] = q * n_img + i
                    i += 1
                else:
                    perm[q * nb + b] = Q * n_img + q * n_txt + j
                    j += 1
        perm = jnp.asarray(perm)
        # row → question, for broadcasting the sampled token to all branches
        row_to_q = jnp.asarray(
            np.concatenate([
                np.repeat(np.arange(Q, dtype=np.int32), n_img),
                np.repeat(np.arange(Q, dtype=np.int32), n_txt),
            ])
        )

        fuse_and_warp = _make_fuse_and_warp(gen, n_contrast)
        stop_hit = _make_stop_hit(kws, Q)

        def batch_fn(params, blob, images, rng):
            xs = _unflatten_blob(blob, spec)
            pack_img, pack_txt = tuple(xs[0:6]), tuple(xs[6:12])
            from llava_align_tpu.ops.image import normalize_device

            tokens, tok_g, img_g, is_img, len_img, feats_src = pack_img
            images = normalize_device(images, adapter.vision_dtype)
            if gen.use_cd:
                rng, rng_noise = jax.random.split(rng)
                noised = add_diffusion_noise(images, rng_noise, gen.noise_step)
                imgs = jnp.concatenate([images, noised], axis=0)
            else:
                imgs = images
            feats = adapter.encode_images(params, imgs)
            N, D = feats.shape[1], feats.shape[2]
            feats_ext = jnp.concatenate([jnp.zeros((1, N, D), feats.dtype), feats], axis=0)
            branch_feats = feats_ext[feats_src + 1]

            # ---- prefill image-bearing rows at their bucket
            cache = self._constrain_cache(adapter.init_cache(R, cache_len), R)
            embeds = adapter.splice_embeds(params, tokens, tok_g, img_g, is_img, branch_feats)
            positions = jnp.broadcast_to(
                jnp.arange(pad_img, dtype=jnp.int32), (Q * n_img, pad_img)
            )
            hidden, cache = adapter.forward(
                params, embeds, positions, cache, jnp.zeros((Q * n_img,), jnp.int32),
                attn_impl=attn_impl, max_seq_len=cache_len,
                tp_mesh=self._tp_mesh,
            )
            last_hidden = hidden[jnp.arange(Q * n_img), len_img - 1]
            logits = adapter.logits(params, last_hidden)
            lengths = len_img

            # ---- prefill text-only rows at theirs (much shorter)
            if n_txt:
                t_tokens, t_tok_g, t_img_g, t_is_img, len_txt, _ = pack_txt
                zero_feats = jnp.zeros((Q * n_txt, 1, D), feats.dtype)
                t_embeds = adapter.splice_embeds(
                    params, t_tokens, t_tok_g, t_img_g, t_is_img, zero_feats
                )
                t_positions = jnp.broadcast_to(
                    jnp.arange(pad_txt, dtype=jnp.int32), (Q * n_txt, pad_txt)
                )
                t_hidden, cache = adapter.forward(
                    params, t_embeds, t_positions, cache,
                    jnp.zeros((Q * n_txt,), jnp.int32), attn_impl=attn_impl,
                    max_seq_len=cache_len, cache_row_offset=Q * n_img,
                    tp_mesh=self._tp_mesh,
                )
                t_last = t_hidden[jnp.arange(Q * n_txt), len_txt - 1]
                logits = jnp.concatenate([logits, adapter.logits(params, t_last)], axis=0)
                lengths = jnp.concatenate([len_img, len_txt], axis=0)
            V = logits.shape[-1]

            init = dict(
                cache=cache,
                lengths=lengths,
                logits=logits,
                out_buf=jnp.zeros((Q, T), jnp.int32),
                first_scores=jnp.zeros((Q, V), jnp.float32),
                n=jnp.asarray(0, jnp.int32),
                done=jnp.zeros((Q,), bool),
                n_done=jnp.full((Q,), T, jnp.int32),
                rng=rng,
            )

            def cond(c):
                return (~jnp.all(c["done"])) & (c["n"] < T)

            def body(c):
                warped = fuse_and_warp(c["logits"][perm].reshape(Q, nb, V))
                first_scores = jnp.where(c["n"] == 0, warped, c["first_scores"])
                rng, sub = jax.random.split(c["rng"])
                toks = S.sample_token(sub, warped, gen.do_sample).astype(jnp.int32)  # [Q]
                toks = jnp.where(c["done"], gen.pad_token_id, toks)
                out_buf = jax.lax.dynamic_update_slice(c["out_buf"], toks[:, None], (0, c["n"]))
                n = c["n"] + 1
                done_now = (toks == gen.eos_token_id) | stop_hit(out_buf, n)
                newly = done_now & (~c["done"])
                done = c["done"] | done_now | (n >= T)
                n_done = jnp.where(newly, n, c["n_done"])

                tok_rows = toks[row_to_q]  # [R], same token for all of a question's branches
                emb = adapter.embed_tokens(params, tok_rows[:, None])
                hidden, cache = adapter.forward(
                    params, emb, c["lengths"][:, None], c["cache"], c["lengths"],
                    attn_impl=attn_impl, max_seq_len=cache_len,
                    tp_mesh=self._tp_mesh,
                )
                logits = adapter.logits(params, hidden[:, 0])
                return dict(
                    cache=cache, lengths=c["lengths"] + 1, logits=logits,
                    out_buf=out_buf, first_scores=first_scores, n=n, done=done,
                    n_done=n_done, rng=rng,
                )

            final = jax.lax.while_loop(cond, body, init)
            probs = jax.nn.softmax(final["first_scores"], axis=-1)
            top_probs, top_ids = jax.lax.top_k(probs, min(topk, V))
            return final["out_buf"], final["n_done"], top_probs, top_ids

        return self._register(key, jax.jit(batch_fn))

    def generate_batch(
        self,
        batch: Sequence[tuple],
        *,
        rng: Optional[jax.Array] = None,
    ) -> List[GenerationOutput]:
        """batch: list of (input_ids, image) — image may be None. All
        questions decode in lockstep on a [Q*nb] packed batch axis; per-
        question done flags stop each answer independently (the reference's
        unfinished_sequences/pad semantics, vcd_sample.py:256-291).

        Prefill is split-bucket like the single-question path: the Q*n_img
        image-bearing rows prefill at the image bucket, the Q*n_txt text-only
        degraded rows at their own (≈8× smaller) bucket, into disjoint cache
        row groups.
        """
        return self.collect_batch(self.submit_batch(batch, rng=rng))

    def submit_batch(
        self,
        batch: Sequence[tuple],
        *,
        rng: Optional[jax.Array] = None,
    ):
        """Async half of generate_batch (host packing + dispatch, no fetch);
        finish with collect_batch. Lets callers overlap several lockstep
        calls — e.g. the calibrate dump path submits the main VDD call and
        both content-free scoring calls before collecting any of them."""
        Q = len(batch)
        if Q == 0:
            return []
        n_img_k = len(self.img_kinds)
        n_txt_k = len(self.txt_kinds)

        img_packs: List[tuple] = []
        txt_packs: List[tuple] = []
        has_images: List[bool] = []
        pad_img = self.bucket
        pad_txt = self.bucket if n_txt_k else 0
        for input_ids, image in batch:
            has_image = image is not None and any(t == IMAGE_TOKEN_INDEX for t in input_ids)
            has_images.append(has_image)
            p = self._pack(input_ids, has_image, kinds=self.img_kinds)
            img_packs.append(p)
            pad_img = max(pad_img, p[0])
            if n_txt_k:
                pt = self._pack(input_ids, has_image, kinds=self.txt_kinds)
                txt_packs.append(pt)
                pad_txt = max(pad_txt, pt[0])

        def assemble(packs, n_k, pad_to):
            rows = Q * n_k
            tokens = np.zeros((rows, pad_to), np.int32)
            tok_g = np.zeros((rows, pad_to), np.int32)
            img_g = np.zeros((rows, pad_to), np.int32)
            is_img = np.zeros((rows, pad_to), bool)
            lengths = np.zeros((rows,), np.int32)
            feats_src = np.full((rows,), -1, np.int32)
            for qi, pack in enumerate(packs):
                _, t, tg, ig, ii, ln, _ = pack
                w = t.shape[1]
                sl = slice(qi * n_k, (qi + 1) * n_k)
                tokens[sl, :w] = t
                tok_g[sl, :w] = tg
                img_g[sl, :w] = ig
                is_img[sl, :w] = ii
                lengths[sl] = ln
            return tokens, tok_g, img_g, is_img, lengths, feats_src

        img_arrs = assemble(img_packs, n_img_k, pad_img)
        for qi in range(Q):
            for i, kind in enumerate(self.img_kinds):
                if kind == "main" and has_images[qi]:
                    img_arrs[5][qi * n_img_k + i] = qi
                elif kind == "cd":
                    img_arrs[5][qi * n_img_k + i] = Q + qi  # noised copies appended

        imgs_np = [
            np.asarray(image) if image is not None else None for _, image in batch
        ]
        images = self._assemble_images(imgs_np, Q)

        if n_txt_k:
            txt_arrs = assemble(txt_packs, n_txt_k, pad_txt)
        else:
            txt_arrs = tuple(np.zeros((0,), np.int32) for _ in range(6))

        if rng is None:
            rng = jax.random.PRNGKey(self.gen.seed)
        blob, spec = _flatten_blob([*img_arrs, *txt_arrs])  # ONE pack transfer
        fn = self._get_batch_fn(pad_img, pad_txt, Q, spec=spec)
        out_buf, n_done, top_probs, top_ids = fn(
            self.params,
            self._put(jnp.asarray(blob)),
            self._put(
                jnp.asarray(images)
                if images.dtype == np.uint8
                else jnp.asarray(images, self.adapter.vision_dtype)
            ),
            self._put(rng),
        )
        return (out_buf, n_done, top_probs, top_ids, img_arrs[4], n_img_k, Q)

    def collect_batch(self, handle) -> List[GenerationOutput]:
        """Blocking half of generate_batch: fetch a submit_batch handle."""
        if not handle:  # submit of an empty batch returns []
            return []
        out_buf, n_done, top_probs, top_ids, lens_img, n_img_k, Q = handle
        # ONE batched fetch — see collect_batch_groups
        out_buf, n_done, top_probs, top_ids = jax.device_get(
            (out_buf, n_done, top_probs, top_ids)
        )
        outs = []
        for qi in range(Q):
            n = int(n_done[qi])
            outs.append(
                GenerationOutput(
                    token_ids=[int(t) for t in out_buf[qi, :n]],
                    num_generated=n,
                    first_scores_top_probs=top_probs[qi],
                    first_scores_top_ids=top_ids[qi],
                    prompt_length=int(lens_img[qi * n_img_k]),
                )
            )
        return outs

    # ------------------------------------------------------------------
    # shared-prefix batched generation (POPE throughput path)
    #
    # Every POPE split ships exactly 6 questions per image, and within one
    # question the VDD branches differ only in their visual degradation; the
    # reference prefills the full [system + image + question] prompt from
    # scratch for every question and branch (vcd_sample.py:109-185). Here the
    # shared [system + image] prefix prefills ONCE into a read-only KV
    # segment; each question's main row prefills only its suffix against
    # [shared | local] joint-softmax attention (ops/attention) and decodes
    # the same way. No KV copies: the prefix segment is read in place by all
    # rows. Text-only degraded rows (~10% the tokens) prefill per question
    # as usual.
    # ------------------------------------------------------------------

    def _get_groups_fn(self, pad_prefix: int, pad_suf: int, pad_txt: int,
                       G: int, Qg: int, ntk_pad: int,
                       sh_kinds: tuple = (), pl_kinds: tuple = (),
                       pad_tp: int = 0, spec: tuple = ()):
        """One jitted program decoding G image-groups of Qg questions each:
        G shared-prefix rows prefill batched, every question's suffix and
        degraded branches run against its group's prefix segment
        (ops/attention grouped shared variants). G=1 is the plain
        generate_batch_prefix case; G>1 amortizes per-call dispatch/transfer
        across groups (the dominant cost once prefill is shared).

        Text-only degraded branches whose transformed prompt prefix is shared
        across the group's questions (sh_kinds — llava unk/none, qwen none;
        verified exactly on the host per call) get their OWN per-group prefix
        segments (second table, pad_tp bucket): the kind's transformed prefix
        prefills once per group and per-question rows run suffix-only — the
        reference re-prefills these branches per question AND per token loop
        entry (vcd_sample.py:147-185). pl_kinds (explicit branch_ids, e.g.
        qwen unk) keep full-prompt rows (pad_txt bucket, no segment)."""
        key = ("prefix", pad_prefix, pad_suf, pad_txt, G, Qg, ntk_pad,
               sh_kinds, pl_kinds, pad_tp)
        if key in self._compiled:
            return self._compiled[key]

        adapter, gen = self.adapter, self.gen
        nb = len(self.kinds)
        n_sh = len(sh_kinds)
        n_pl = len(pl_kinds)
        img_kinds = self.img_kinds          # ['main'] or ['main', 'cd']
        n_img = len(img_kinds)
        M = G * Qg                          # questions
        M2 = M * n_img                      # image-bearing rows (segment-major)
        Msh = M * n_sh                      # shared-text rows (segment-major)
        R = M2 + Msh + M * n_pl
        n_contrast = nb - 1
        T = gen.max_new_tokens
        cache_len = max(pad_suf, pad_txt if n_pl else 0) + T
        # One length drives position-dependent scaling (qwen dynamic-NTK) in
        # every phase — and it must be the SAME length the unshared paths
        # would use for these prompts (bucket(full spliced length) + T,
        # engine generate/generate_batch cache_len), or NTK alpha could
        # differ between grouped and fallback execution near seq_length.
        total_len = ntk_pad + T
        kws = [np.asarray(k, np.int32) for k in self.stop_keyword_ids if 0 < len(k) <= T]
        attn_impl = self.attn_impl
        topk = self.top_scores_k

        # rows: [G*n_img segment blocks of Qg image-bearing rows |
        # G*n_sh segment blocks of Qg shared-text rows | M*n_pl plain text
        # rows (question-major)]. With use_cd the noised-image branch gets
        # its OWN shared prefix segment per group (segment g*n_img+1).
        perm = np.zeros((M * nb,), np.int32)
        for qq in range(M):
            g, q = divmod(qq, Qg)
            jp = 0
            for b, kind in enumerate(self.kinds):
                if kind in ("main", "cd"):
                    i = img_kinds.index(kind)
                    perm[qq * nb + b] = (g * n_img + i) * Qg + q
                elif kind in sh_kinds:
                    j = sh_kinds.index(kind)
                    perm[qq * nb + b] = M2 + (g * n_sh + j) * Qg + q
                else:
                    perm[qq * nb + b] = M2 + Msh + qq * n_pl + jp
                    jp += 1
        perm = jnp.asarray(perm)
        r2q = np.zeros((R,), np.int32)
        for g in range(G):
            for i in range(n_img):
                for q in range(Qg):
                    r2q[(g * n_img + i) * Qg + q] = g * Qg + q
        for g in range(G):
            for j in range(n_sh):
                for q in range(Qg):
                    r2q[M2 + (g * n_sh + j) * Qg + q] = g * Qg + q
        r2q[M2 + Msh:] = np.repeat(np.arange(M, dtype=np.int32), n_pl)
        row_to_q = jnp.asarray(r2q)

        fuse_and_warp = _make_fuse_and_warp(gen, n_contrast)
        stop_hit = _make_stop_hit(kws, M)

        def groups_fn(params, blob, images, rng):
            xs = _unflatten_blob(blob, spec)
            pack_prefix = tuple(xs[0:6])
            suf_tokens, suf_lens = xs[6], xs[7]
            pack_tp = tuple(xs[8:14])
            pack_txt = tuple(xs[14:20])
            from llava_align_tpu.ops.image import normalize_device

            p_tokens, p_tok_g, p_img_g, p_is_img, p_len, _ = pack_prefix
            images = normalize_device(images, adapter.vision_dtype)
            if n_img == 2:  # VCD: noised copies get their own segments
                rng, rng_noise = jax.random.split(rng)
                noised = add_diffusion_noise(images, rng_noise, gen.noise_step)
                imgs = jnp.concatenate([images, noised], axis=0)  # [2G, ...]
            else:
                imgs = images
            feats_all = adapter.encode_images(params, imgs)  # [G*n_img, N, D]
            D = feats_all.shape[2]
            if n_img == 2:
                # [clean_g | noised_g] -> segment order [g0 clean, g0 noised, ...]
                feats = jnp.stack(
                    [feats_all[:G], feats_all[G:]], axis=1
                ).reshape(G * n_img, feats_all.shape[1], D)
            else:
                feats = feats_all

            def seg_tile(x):
                """[G, ...] group arrays -> [G*n_img, ...] segment arrays."""
                return jnp.repeat(x, n_img, axis=0)

            # ---- shared prefix prefill: G*n_img segment rows, own cache
            n_seg = G * n_img
            p_cache = self._constrain_cache(
                adapter.init_cache(n_seg, pad_prefix), n_seg
            )
            p_embeds = adapter.splice_embeds(
                params, seg_tile(p_tokens), seg_tile(p_tok_g),
                seg_tile(p_img_g), seg_tile(p_is_img), feats
            )
            p_positions = jnp.broadcast_to(
                jnp.arange(pad_prefix, dtype=jnp.int32), (n_seg, pad_prefix)
            )
            _, p_cache = adapter.forward(
                params, p_embeds, p_positions, p_cache,
                jnp.zeros((n_seg,), jnp.int32), attn_impl=attn_impl,
                max_seq_len=total_len, tp_mesh=self._tp_mesh,
            )
            # [L, n_seg, P, K, Dh] (+ ks/vs scale planes for int8 caches)
            shared = dict(p_cache)
            seg_len = seg_tile(p_len)  # [n_seg]

            # ---- shared TEXT-branch prefixes: G*n_sh segment rows at their
            # own (short) bucket — each kind's transformed prefix prefills
            # once per group instead of once per question
            if n_sh:
                tp_tokens, tp_tok_g, tp_img_g, tp_is_img, tp_len, _ = pack_tp
                n_seg_t = G * n_sh
                t_cache = self._constrain_cache(
                    adapter.init_cache(n_seg_t, pad_tp), n_seg_t
                )
                tp_embeds = adapter.splice_embeds(
                    params, tp_tokens, tp_tok_g, tp_img_g, tp_is_img,
                    jnp.zeros((n_seg_t, 1, D), feats.dtype),
                )
                tp_positions = jnp.broadcast_to(
                    jnp.arange(pad_tp, dtype=jnp.int32), (n_seg_t, pad_tp)
                )
                _, t_cache = adapter.forward(
                    params, tp_embeds, tp_positions, t_cache,
                    jnp.zeros((n_seg_t,), jnp.int32), attn_impl=attn_impl,
                    max_seq_len=total_len, tp_mesh=self._tp_mesh,
                )
                shared["k2"] = t_cache["k"]  # [L, G*n_sh, Pt, K, Dh]
                shared["v2"] = t_cache["v"]
                if "ks" in t_cache:  # int8 cache: second table's scale planes
                    shared["k2s"] = t_cache["ks"]
                    shared["v2s"] = t_cache["vs"]
                sh_len_txt = jnp.repeat(tp_len, Qg)  # [Msh], rows [g, j, q]

            # ---- per-question suffixes against [segment's shared | local]:
            # image-bearing rows AND shared-text rows in ONE forward (same
            # suffix tokens; each row span attends its own segment table)
            cache = self._constrain_cache(adapter.init_cache(R, cache_len), R)
            # suffix rows span-blocked: ALL image rows [g, i, q] first, then
            # ALL shared-text rows [g, j, q] (the attention tables cover
            # contiguous row spans — interleaving per group would misalign
            # rows and segments for G > 1)
            def span_tile(x, n, rows):
                return jnp.repeat(
                    x.reshape((G, 1, Qg) + x.shape[2:]), n, axis=1
                ).reshape((rows,) + x.shape[2:])

            suf_t = suf_tokens.reshape(G, Qg, -1)
            suf_l = suf_lens.reshape(G, Qg)
            suf_tokens2 = span_tile(suf_t, n_img, M2)
            suf_lens2 = span_tile(suf_l, n_img, M2)
            if n_sh:
                suf_tokens2 = jnp.concatenate(
                    [suf_tokens2, span_tile(suf_t, n_sh, Msh)], axis=0
                )
                suf_lens2 = jnp.concatenate(
                    [suf_lens2, span_tile(suf_l, n_sh, Msh)], axis=0
                )
            s_embeds = adapter.embed_tokens(params, suf_tokens2)
            sh_len_main = jnp.repeat(seg_len, Qg)  # [M2]
            sh_len_suf = (
                jnp.concatenate([sh_len_main, sh_len_txt], axis=0)
                if n_sh
                else sh_len_main
            )
            s_positions = sh_len_suf[:, None] + jnp.broadcast_to(
                jnp.arange(pad_suf, dtype=jnp.int32), (M2 + Msh, pad_suf)
            )
            s_hidden, cache = adapter.forward(
                params, s_embeds, s_positions, cache,
                jnp.zeros((M2 + Msh,), jnp.int32), attn_impl=attn_impl,
                max_seq_len=total_len, tp_mesh=self._tp_mesh,
                shared_kv=shared, shared_len=sh_len_suf,
                shared_rows_per_prefix=Qg, shared_rows_per_prefix2=Qg,
            )
            last = s_hidden[jnp.arange(M2 + Msh), suf_lens2 - 1]
            logits = adapter.logits(params, last)
            lengths = suf_lens2

            # ---- plain text rows (explicit branch ids): full short prompts
            if n_pl:
                t_tokens, t_tok_g, t_img_g, t_is_img, len_txt, _ = pack_txt
                zero_feats = jnp.zeros((M * n_pl, 1, D), feats.dtype)
                t_embeds = adapter.splice_embeds(
                    params, t_tokens, t_tok_g, t_img_g, t_is_img, zero_feats
                )
                t_positions = jnp.broadcast_to(
                    jnp.arange(pad_txt, dtype=jnp.int32), (M * n_pl, pad_txt)
                )
                t_hidden, cache = adapter.forward(
                    params, t_embeds, t_positions, cache,
                    jnp.zeros((M * n_pl,), jnp.int32), attn_impl=attn_impl,
                    max_seq_len=total_len, cache_row_offset=M2 + Msh,
                    tp_mesh=self._tp_mesh,
                )
                t_last = t_hidden[jnp.arange(M * n_pl), len_txt - 1]
                logits = jnp.concatenate([logits, adapter.logits(params, t_last)], axis=0)
                lengths = jnp.concatenate([lengths, len_txt], axis=0)
            V = logits.shape[-1]
            sh_len_all = jnp.concatenate(
                [sh_len_suf, jnp.zeros((M * n_pl,), jnp.int32)], axis=0
            )  # [R]: segmented rows carry their segment length, plain rows 0

            init = dict(
                cache=cache,
                lengths=lengths,
                logits=logits,
                out_buf=jnp.zeros((M, T), jnp.int32),
                first_scores=jnp.zeros((M, V), jnp.float32),
                n=jnp.asarray(0, jnp.int32),
                done=jnp.zeros((M,), bool),
                n_done=jnp.full((M,), T, jnp.int32),
                rng=rng,
            )

            def cond(c):
                return (~jnp.all(c["done"])) & (c["n"] < T)

            def body(c):
                warped = fuse_and_warp(c["logits"][perm].reshape(M, nb, V))
                first_scores = jnp.where(c["n"] == 0, warped, c["first_scores"])
                rng, sub = jax.random.split(c["rng"])
                toks = S.sample_token(sub, warped, gen.do_sample).astype(jnp.int32)
                toks = jnp.where(c["done"], gen.pad_token_id, toks)
                out_buf = jax.lax.dynamic_update_slice(c["out_buf"], toks[:, None], (0, c["n"]))
                n = c["n"] + 1
                done_now = (toks == gen.eos_token_id) | stop_hit(out_buf, n)
                newly = done_now & (~c["done"])
                done = c["done"] | done_now | (n >= T)
                n_done = jnp.where(newly, n, c["n_done"])

                tok_rows = toks[row_to_q]
                emb = adapter.embed_tokens(params, tok_rows[:, None])
                # positions are absolute (prefix + local); cache offsets local
                positions = (sh_len_all + c["lengths"])[:, None]
                hidden, cache = adapter.forward(
                    params, emb, positions, c["cache"], c["lengths"],
                    attn_impl=attn_impl, max_seq_len=total_len,
                    tp_mesh=self._tp_mesh,
                    shared_kv=shared, shared_len=sh_len_all,
                    shared_rows_per_prefix=Qg, shared_rows_per_prefix2=Qg,
                )
                logits = adapter.logits(params, hidden[:, 0])
                return dict(
                    cache=cache, lengths=c["lengths"] + 1, logits=logits,
                    out_buf=out_buf, first_scores=first_scores, n=n, done=done,
                    n_done=n_done, rng=rng,
                )

            final = jax.lax.while_loop(cond, body, init)
            probs = jax.nn.softmax(final["first_scores"], axis=-1)
            top_probs, top_ids = jax.lax.top_k(probs, min(topk, V))
            return final["out_buf"], final["n_done"], top_probs, top_ids

        return self._register(key, jax.jit(groups_fn))

    def generate_batch_prefix(
        self,
        prefix_ids: Sequence[int],
        suffixes: Sequence[Sequence[int]],
        image: Optional[np.ndarray],
        *,
        rng: Optional[jax.Array] = None,
        branch_ids_list: Optional[Sequence[Mapping[str, Sequence[int]]]] = None,
    ) -> List[GenerationOutput]:
        """Lockstep-decode Q questions that share one image AND one token
        prefix (one group; see generate_batch_groups). prefix_ids contains
        the IMAGE_TOKEN_INDEX sentinel; each question's full prompt is
        prefix_ids + suffixes[q] (callers compute the split as the longest
        common token prefix, which is exact by construction). Token streams
        match generate_batch on the same prompts; the prefix KV is computed
        once instead of Q times.
        branch_ids_list: optional per-question explicit token ids for the
        text-only degraded branches (models whose degraded prompts need the
        tokenizer — qwen 'unk', qwen_calibrate.py:37)."""
        return self.generate_batch_groups(
            [(prefix_ids, suffixes, image, branch_ids_list)], rng=rng
        )

    def generate_batch_groups(
        self,
        groups: Sequence[tuple],
        *,
        rng: Optional[jax.Array] = None,
    ) -> List[GenerationOutput]:
        """Lockstep-decode G image-groups in ONE jitted call. Each group is
        (prefix_ids, suffixes, image[, branch_ids_list]); all groups must
        carry the same number of questions (pad the tail group by repeating
        a question and drop the duplicates). Returns outputs question-major
        (group 0's questions first). With use_cd (VCD) each group gets a
        SECOND shared segment holding the diffusion-noised image's prefix KV
        — the cd branch rides the grouped machinery too."""
        return self.collect_batch_groups(self.submit_batch_groups(groups, rng=rng))

    def submit_batch_groups(
        self,
        groups: Sequence[tuple],
        *,
        rng: Optional[jax.Array] = None,
    ):
        """Async half of generate_batch_groups: host packing + jitted-call
        dispatch, no blocking fetch. Returns a handle for
        collect_batch_groups. Submitting call g+1 before collecting call g
        overlaps g+1's host packing and input transfer with g's device
        execution — the per-call fixed cost (~135ms over the remote tunnel)
        that otherwise serializes between calls. Inputs are small (token
        packs + uint8 images), so one queued call adds no meaningful HBM."""
        if self.gen.use_cd and any(g[2] is None for g in groups):
            raise ValueError(
                "use_cd groups need an image (the noised prefix segment); "
                "use generate_batch for image-less cd prompts"
            )
        if not getattr(self.adapter, "supports_shared_prefix", False):
            raise ValueError(
                f"adapter {self.adapter.name!r} has no shared-prefix forward"
            )
        G = len(groups)
        if G == 0:
            return []
        groups = [tuple(g) + (None,) * (4 - len(g)) for g in groups]
        Qg = len(groups[0][1])
        if Qg == 0 or any(len(g[1]) != Qg for g in groups):
            raise ValueError(
                "every group must carry the same (nonzero) question count; "
                "pad the tail group by repeating a question"
            )
        for _, suffixes, _, _ in groups:
            if any(len(s) == 0 for s in suffixes):
                raise ValueError("each suffix needs >= 1 token")
            if any(IMAGE_TOKEN_INDEX in [int(t) for t in s] for s in suffixes):
                raise ValueError(
                    "image sentinel must be inside the shared prefix, not a "
                    "suffix — group questions by image before splitting"
                )
        M = G * Qg
        # text kinds whose transformed prompt prefix is shared across every
        # question (verified exactly: branch(prefix)+suffix == branch(full))
        # get per-group prefix segments; the rest keep full-prompt rows.
        # (At most two compile keys per shape family can arise from a
        # partition flip — both stay cached, so a non-conforming batch costs
        # one extra compile, not a flip-flop.)
        tp_bases = {}  # kind -> per-group transformed prefix ids
        sh = []
        for k in self.txt_kinds:
            bases = self._txt_kind_prefix_bases(k, groups)
            if bases is not None:
                sh.append(k)
                tp_bases[k] = bases
        sh_kinds = tuple(sh)
        pl_kinds = tuple(k for k in self.txt_kinds if k not in sh_kinds)
        n_sh_k, n_pl_k = len(sh_kinds), len(pl_kinds)

        # ---- prefix rows (one per group, shared bucket)
        prefix_packs = []
        pad_prefix = self.bucket
        for prefix_ids, _, image, _ in groups:
            has_image = image is not None and any(
                t == IMAGE_TOKEN_INDEX for t in prefix_ids
            )
            pk = self._pack(list(prefix_ids), has_image, kinds=["main"])
            prefix_packs.append((pk, has_image))
            pad_prefix = max(pad_prefix, pk[0])
        p_arrs = [
            np.zeros((G, pad_prefix), np.int32),
            np.zeros((G, pad_prefix), np.int32),
            np.zeros((G, pad_prefix), np.int32),
            np.zeros((G, pad_prefix), bool),
        ]
        p_lens = np.zeros((G,), np.int32)
        for gi, (pk, _) in enumerate(prefix_packs):
            _, t, tg, ig, ii, ln, _ = pk
            w = t.shape[1]
            p_arrs[0][gi, :w] = t[0]
            p_arrs[1][gi, :w] = tg[0]
            p_arrs[2][gi, :w] = ig[0]
            p_arrs[3][gi, :w] = ii[0]
            p_lens[gi] = ln[0]
        pack_prefix = (*p_arrs, p_lens, np.full((G,), -1, np.int32))

        # ---- suffix rows [M]
        max_suf = max(len(s) for _, sfx, _, _ in groups for s in sfx)
        pad_suf = _round_up(max(max_suf, 32), 32)
        suf_tokens = np.zeros((M, pad_suf), np.int32)
        suf_lens = np.zeros((M,), np.int32)
        for gi, (_, sfx, _, _) in enumerate(groups):
            for qi, s in enumerate(sfx):
                row = gi * Qg + qi
                suf_tokens[row, : len(s)] = [int(t) for t in s]
                suf_lens[row] = len(s)

        # ---- shared text-branch prefix rows [G * n_sh] (own short bucket):
        # one row per (group, shared kind) — the kind's transformed prefix
        tp_packs = []
        pad_tp = 0
        if n_sh_k:
            pad_tp = self.bucket
            for gi, (prefix_ids, _, _, _) in enumerate(groups):
                for kind in sh_kinds:
                    # pass the already-computed transformed prefix as explicit
                    # branch ids — no recompute, no idempotency assumption
                    pk = self._pack(
                        list(prefix_ids), False,
                        {kind: tp_bases[kind][gi]}, kinds=[kind],
                    )
                    tp_packs.append(pk)
                    pad_tp = max(pad_tp, pk[0])
            rows = G * n_sh_k
            tp_arrs = [
                np.zeros((rows, pad_tp), np.int32),
                np.zeros((rows, pad_tp), np.int32),
                np.zeros((rows, pad_tp), np.int32),
                np.zeros((rows, pad_tp), bool),
            ]
            tp_lens = np.zeros((rows,), np.int32)
            for ri, pk in enumerate(tp_packs):
                _, t, tg, ig, ii, ln, _ = pk
                w = t.shape[1]
                tp_arrs[0][ri, :w] = t[0]
                tp_arrs[1][ri, :w] = tg[0]
                tp_arrs[2][ri, :w] = ig[0]
                tp_arrs[3][ri, :w] = ii[0]
                tp_lens[ri] = ln[0]
            pack_tp = (*tp_arrs, tp_lens, np.full((rows,), -1, np.int32))
        else:
            pack_tp = tuple(np.zeros((0,), np.int32) for _ in range(6))

        # ---- plain text-only degraded rows [M * n_pl] (full short prompts)
        pad_txt = self.bucket if n_pl_k else 0
        txt_packs = []
        if n_pl_k:
            for gi, (prefix_ids, sfx, image, bids_list) in enumerate(groups):
                has_image = prefix_packs[gi][1]
                for qi, s in enumerate(sfx):
                    full = list(prefix_ids) + [int(t) for t in s]
                    bids = bids_list[qi] if bids_list else None
                    pt = self._pack(full, has_image, bids, kinds=list(pl_kinds))
                    txt_packs.append(pt)
                    pad_txt = max(pad_txt, pt[0])
            rows = M * n_pl_k
            t_arrs = [
                np.zeros((rows, pad_txt), np.int32),
                np.zeros((rows, pad_txt), np.int32),
                np.zeros((rows, pad_txt), np.int32),
                np.zeros((rows, pad_txt), bool),
            ]
            t_lens = np.zeros((rows,), np.int32)
            for qi, pack in enumerate(txt_packs):
                _, t, tg, ig, ii, ln, _ = pack
                w = t.shape[1]
                sl = slice(qi * n_pl_k, (qi + 1) * n_pl_k)
                t_arrs[0][sl, :w] = t
                t_arrs[1][sl, :w] = tg
                t_arrs[2][sl, :w] = ig
                t_arrs[3][sl, :w] = ii
                t_lens[sl] = ln
            pack_txt = (*t_arrs, t_lens, np.full((rows,), -1, np.int32))
        else:
            pack_txt = tuple(np.zeros((0,), np.int32) for _ in range(6))

        # ---- images [G, 3, H, W] (uint8 ships raw when uniform)
        imgs_np = [
            np.asarray(g[2]) if g[2] is not None else None for g in groups
        ]
        if any(i is not None and i.ndim == 4 for i in imgs_np):
            raise ValueError(
                "anyres grid stacks ([K,3,H,W]) are per-question inputs; "
                "shared-prefix grouping needs single images — decode anyres "
                "prompts through engine.generate"
            )
        images = self._assemble_images(imgs_np, G)

        if rng is None:
            rng = jax.random.PRNGKey(self.gen.seed)
        # the bucketed full-prompt length the UNSHARED paths would compile
        # with (drives qwen dynamic-NTK identically in both layouts)
        max_full = max(
            int(p_lens[row // Qg]) + int(suf_lens[row]) for row in range(M)
        )
        ntk_pad = _round_up(max(max_full, self.bucket), self.bucket)
        # ONE transfer for every token-pack array (the spec is determined by
        # the compile key, so the cached program's unpack always matches)
        blob, spec = _flatten_blob(
            [*pack_prefix, suf_tokens, suf_lens, *pack_tp, *pack_txt]
        )
        fn = self._get_groups_fn(
            pad_prefix, pad_suf, pad_txt, G, Qg, ntk_pad,
            sh_kinds=sh_kinds, pl_kinds=pl_kinds, pad_tp=pad_tp, spec=spec,
        )
        out_buf, n_done, top_probs, top_ids = fn(
            self.params,
            self._put(jnp.asarray(blob)),
            self._put(
                jnp.asarray(images)
                if images.dtype == np.uint8
                else jnp.asarray(images, self.adapter.vision_dtype)
            ),
            self._put(rng),
        )
        return (out_buf, n_done, top_probs, top_ids, p_lens, suf_lens, Qg, M)

    def collect_batch_groups(self, handle) -> List[GenerationOutput]:
        """Blocking half of generate_batch_groups: fetch the device outputs
        of a submit_batch_groups handle and assemble GenerationOutputs."""
        if not handle:  # submit of an empty groups list returns []
            return []
        out_buf, n_done, top_probs, top_ids, p_lens, suf_lens, Qg, M = handle
        # ONE batched fetch (jax.device_get starts every copy async before
        # blocking) — four sequential np.asarray round-trips cost ~65ms over
        # the tunnel; per-row indexing would cost one round-trip per question
        out_buf, n_done, top_probs, top_ids = jax.device_get(
            (out_buf, n_done, top_probs, top_ids)
        )
        outs = []
        for row in range(M):
            n = int(n_done[row])
            outs.append(
                GenerationOutput(
                    token_ids=[int(t) for t in out_buf[row, :n]],
                    num_generated=n,
                    first_scores_top_probs=top_probs[row],
                    first_scores_top_ids=top_ids[row],
                    prompt_length=int(p_lens[row // Qg]) + int(suf_lens[row]),
                )
            )
        return outs

    def _txt_kind_prefix_bases(self, kind: str, groups):
        """Per-group transformed prefixes when this text kind's branch
        transform is prefix-local for EVERY question — branch(prefix) +
        suffix == branch(prefix + suffix) — so one per-group prefix segment
        reproduces the per-question rows exactly; None otherwise. Explicit
        branch_ids (qwen 'unk': per-question retokenized prompts,
        qwen_calibrate.py:37) are never splittable."""
        adapter = self.adapter
        bases = []
        for prefix_ids, sfx, _, bids_list in groups:
            if bids_list and any(b and kind in b for b in bids_list):
                return None
            pref = [int(t) for t in prefix_ids]
            try:
                base = list(adapter.branch_token_ids(pref, kind))
            except Exception:
                return None
            if not base:
                return None  # empty transformed prefix: nothing to share
            for s in sfx:
                suf = [int(t) for t in s]
                if adapter.branch_token_ids(pref + suf, kind) != base + suf:
                    return None
            bases.append(base)
        return bases

    @staticmethod
    def common_token_prefix(token_lists: Sequence[Sequence[int]]) -> int:
        """Longest common prefix length over token lists, capped so every
        list keeps >= 1 suffix token (exact prefix/suffix split for
        generate_batch_prefix)."""
        if not token_lists:
            return 0
        lo = min(len(t) for t in token_lists)
        p = 0
        first = token_lists[0]
        while p < lo - 1 and all(t[p] == first[p] for t in token_lists):
            p += 1
        return p

    # ------------------------------------------------------------------
    # beam search (single-branch; reference blip2 generate num_beams=5 —
    # the reference sampler never combines CD with beams)
    # ------------------------------------------------------------------

    def _get_beam_fn(self, pad: int, num_beams: int, precomputed_feats: bool,
                     length_penalty: float, min_new_tokens: int):
        key = ("beam", pad, num_beams, precomputed_feats, length_penalty,
               min_new_tokens)
        if key in self._compiled:
            return self._compiled[key]

        from llava_align_tpu.decoding.beam import make_beam_fn

        adapter, gen = self.adapter, self.gen
        T = gen.max_new_tokens
        cache_len = pad + T
        beam_core = make_beam_fn(
            adapter, num_beams=num_beams, max_new_tokens=T,
            eos_token_id=gen.eos_token_id, pad_token_id=gen.pad_token_id,
            length_penalty=length_penalty, min_new_tokens=min_new_tokens,
            attn_impl=self.attn_impl, cache_len=cache_len,
            tp_mesh=self._tp_mesh,
        )
        attn_impl = self.attn_impl

        def fn(params, pack, images):
            tokens, tok_g, img_g, is_img, lens, feats_src = pack  # 1 main row
            if precomputed_feats:
                feats = images
            else:
                from llava_align_tpu.ops.image import normalize_device

                images = normalize_device(images, adapter.vision_dtype)
                G = images.shape[0]
                grid_feats = adapter.encode_images(params, images)
                D = grid_feats.shape[2]
                feats = grid_feats.reshape(1, -1, D)
            N, D = feats.shape[1], feats.shape[2]
            feats_ext = jnp.concatenate(
                [jnp.zeros((1, N, D), feats.dtype), feats], axis=0
            )
            branch_feats = feats_ext[feats_src + 1]

            cache = self._constrain_cache(adapter.init_cache(1, cache_len), 1)
            embeds = adapter.splice_embeds(params, tokens, tok_g, img_g, is_img, branch_feats)
            positions = jnp.broadcast_to(jnp.arange(pad, dtype=jnp.int32), (1, pad))
            hidden, cache = adapter.forward(
                params, embeds, positions, cache, jnp.zeros((1,), jnp.int32),
                attn_impl=attn_impl, max_seq_len=cache_len,
                tp_mesh=self._tp_mesh,
            )
            first_logits = adapter.logits(params, hidden[jnp.arange(1), lens - 1])
            return beam_core(params, cache, first_logits, lens)

        return self._register(key, jax.jit(fn))

    def generate_beam(
        self,
        input_ids: Sequence[int],
        image: Optional[np.ndarray] = None,
        *,
        num_beams: int = 5,
        length_penalty: float = 1.0,
        min_new_tokens: int = 0,
        precomputed_feats: Optional[np.ndarray] = None,
    ) -> GenerationOutput:
        """HF-semantics beam search (do_sample=False, early_stopping=False):
        token-exact vs transformers generate on shared weights (tests).
        Returned token_ids exclude the finishing eos (runners decode with
        skip_special_tokens anyway)."""
        if len(self.kinds) != 1:
            raise ValueError(
                "beam search is single-branch; the reference never combines "
                "CD/DD with beams (vcd_sample patches `sample` only)"
            )
        has_image = (image is not None or precomputed_feats is not None) and any(
            t == IMAGE_TOKEN_INDEX for t in input_ids
        )
        n_tok = None
        if precomputed_feats is not None:
            # np.shape reads metadata only — np.asarray on a device
            # array would block and fetch the whole feature tensor
            n_tok = int(np.shape(precomputed_feats)[1])
        elif image is not None and len(np.shape(image)) == 4:
            # np.shape, NOT np.asarray(...).shape: the latter FETCHES a
            # device array over the tunnel just to read metadata (CLAUDE.md
            # transfer-discipline trap)
            n_tok = self.adapter.num_image_tokens * int(np.shape(image)[0])
        pad, *pi = self._pack(
            input_ids, has_image, num_image_tokens=n_tok, kinds=["main"]
        )
        pack = tuple(jnp.asarray(a) for a in pi)
        if precomputed_feats is not None:
            images = jnp.asarray(precomputed_feats)
        elif image is not None:
            img = np.asarray(image)
            if img.ndim == 3:
                img = img[None]
            images = (
                jnp.asarray(img)
                if img.dtype == np.uint8
                else jnp.asarray(img, self.adapter.vision_dtype)
            )
        else:
            H = self.adapter.image_size
            images = jnp.zeros((1, 3, H, H), self.adapter.vision_dtype)
        fn = self._get_beam_fn(
            pad, num_beams, precomputed_feats is not None, length_penalty,
            min_new_tokens,
        )
        seq, n, score = fn(self.params, self._put(pack), self._put(images))
        seq, n = jax.device_get((seq, n))  # one batched fetch
        n = int(n)
        return GenerationOutput(
            token_ids=[int(t) for t in np.asarray(seq)[:n]],
            num_generated=n,
            first_scores_top_probs=np.zeros((0,), np.float32),
            first_scores_top_ids=np.zeros((0,), np.int64),
            prompt_length=int(pi[4][0]),
        )

    # ------------------------------------------------------------------

    def generate(
        self,
        input_ids: Sequence[int],
        image: Optional[np.ndarray] = None,
        *,
        rng: Optional[jax.Array] = None,
        branch_ids: Optional[Mapping[str, Sequence[int]]] = None,
        precomputed_feats: Optional[np.ndarray] = None,
    ) -> GenerationOutput:
        """image: normalized pixels [3, H, W], an anyres grid stack
        [G, 3, H, W] (each grid contributes num_image_tokens features,
        concatenated — reference mm_utils process_anyres_image), or None.
        branch_ids: optional explicit token ids per branch kind (models whose
        degraded prompts need the tokenizer, e.g. qwen 'unk').
        precomputed_feats: [n_srcs, N, D] image features computed outside the
        engine (row 0 = main, row 1 = cd); replaces on-engine vision encode
        (InstructBLIP's text-conditioned Q-Former path)."""
        return self.collect_generate(
            self.submit_generate(
                input_ids, image, rng=rng, branch_ids=branch_ids,
                precomputed_feats=precomputed_feats,
            )
        )

    def submit_generate(
        self,
        input_ids: Sequence[int],
        image: Optional[np.ndarray] = None,
        *,
        rng: Optional[jax.Array] = None,
        branch_ids: Optional[Mapping[str, Sequence[int]]] = None,
        precomputed_feats: Optional[np.ndarray] = None,
    ):
        """Async half of generate: host packing + jitted-call dispatch, no
        blocking fetch. Returns a handle for collect_generate; submitting the
        next question before collecting this one overlaps host prep + input
        transfer with device execution (serial runners: MMMU, sweeps)."""
        has_image = (image is not None or precomputed_feats is not None) and any(
            t == IMAGE_TOKEN_INDEX for t in input_ids
        )
        n_tok = None
        if precomputed_feats is not None:
            # np.shape reads metadata only — np.asarray on a device
            # array would block and fetch the whole feature tensor
            n_tok = int(np.shape(precomputed_feats)[1])
        elif image is not None and len(np.shape(image)) == 4:
            # np.shape, NOT np.asarray(...).shape: the latter FETCHES a
            # device array over the tunnel just to read metadata (CLAUDE.md
            # transfer-discipline trap)
            n_tok = self.adapter.num_image_tokens * int(np.shape(image)[0])

        pad_img, *pi = self._pack(
            input_ids, has_image, branch_ids, num_image_tokens=n_tok,
            kinds=self.img_kinds,
        )
        if self.txt_kinds:
            pad_txt, *pt = self._pack(
                input_ids, has_image, branch_ids, num_image_tokens=n_tok,
                kinds=self.txt_kinds,
            )
        else:
            pad_txt = 0
            pt = [np.zeros((0,), np.int32) for _ in range(6)]
        main_len = int(pi[4][0])

        if precomputed_feats is not None:
            images = jnp.asarray(precomputed_feats)
        elif image is not None:
            img = np.asarray(image)
            if img.ndim == 3:
                img = img[None]
            # uint8 ships raw (normalize_device runs in-jit); floats are
            # already normalized and cast host-side
            images = (
                jnp.asarray(img)
                if img.dtype == np.uint8
                else jnp.asarray(img, self.adapter.vision_dtype)
            )
        else:
            H = self.adapter.image_size
            images = jnp.zeros((1, 3, H, H), self.adapter.vision_dtype)
        if rng is None:
            rng = jax.random.PRNGKey(self.gen.seed)
        blob, spec = _flatten_blob([*pi, *pt])  # ONE pack transfer
        fn = self._get_fn(pad_img, pad_txt, precomputed_feats is not None, spec=spec)
        out_buf, n, top_probs, top_ids = fn(
            self.params, self._put(jnp.asarray(blob)),
            self._put(images), self._put(rng),
        )
        return (out_buf, n, top_probs, top_ids, main_len)

    def collect_generate(self, handle) -> GenerationOutput:
        """Blocking half of generate: fetch the device outputs of a
        submit_generate handle."""
        out_buf, n, top_probs, top_ids, main_len = handle
        # ONE batched fetch — see collect_batch_groups
        out_buf, n, top_probs, top_ids = jax.device_get(
            (out_buf, n, top_probs, top_ids)
        )
        n = int(n)
        return GenerationOutput(
            token_ids=[int(t) for t in out_buf[:n]],
            num_generated=n,
            first_scores_top_probs=np.asarray(top_probs),
            first_scores_top_ids=np.asarray(top_ids),
            prompt_length=main_len,
        )
