"""Weight-only int8 quantization for serving.

Not present in the reference (it serves fp16 via HF bitsandbytes 4/8-bit,
builder.py:29-38 — capability analog). TPU-native design: weights are stored
int8 with per-output-channel absmax scales; the hot matmuls read int8 from HBM
(halving the decode-time weight traffic that bounds tokens/sec) and dequantize
in VMEM right before the MXU via a Pallas kernel. Accumulation fp32, scales
applied once per output channel after the D-reduction.

The XLA fallback (CPU/tests, large-contraction prefill) dequantizes q*s to
the activation dtype then matmuls — equal within bf16 rounding of the kernel
path (the kernel accumulates fp32 and applies scales post-reduction; the
fallback rounds each dequantized weight to bf16 first, ~2^-8 relative). The
on-chip deviation is measured at <=1.8 bf16 ulps of the max output element
at 7B shapes (scripts/verify_on_chip.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., O, D] float → {'q': int8 [..., O, D], 's': f32 [..., O]}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-1)
    s = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(wf / s[..., None]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def dequantize(wq: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["s"][..., None]).astype(dtype)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


def int8_matmul_xla(h: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """h [..., D] x int8 [O, D] (scales [O]) → [..., O] in h.dtype."""
    w = (q.astype(jnp.float32) * s[:, None]).astype(h.dtype)
    return jax.lax.dot_general(
        h, w,
        (((h.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=h.dtype,
    )


# ---------------------------------------------------------------------------
# Pallas kernel: int8 weights stay int8 through HBM→VMEM; dequant on the VPU
# feeds the MXU in the compute dtype.
#
# Block recipe (measured on v5e, slope-timed device-side loops to cancel the
# dispatch overhead of the remote runtime): fixed bO=512 (or the largest of
# 512/256/128 dividing O), bD = D halved until the double-buffered working
# set fits ~8MB of VMEM, grid (O/bO, D/bD) with ("parallel", "arbitrary")
# dimension semantics and an fp32 acc scratch. This streams each weight byte
# exactly once in ~2-5MB contiguous blocks: 700-1000 GB/s effective vs the
# ~180-540 GB/s of the previous (B, O, D)-tiled 256x512 kernel — the decode
# matmul stack drops from ~22.9ms to ~8ms per token at 7B shapes.
#
# Dispatch (round 3, measured on a v5e chip — scripts/bench_int8_prefill.py,
# slope-timed 7B stacks): the kernel streams each weight byte once with the
# whole row block resident in VMEM, so it also wins at short-prefill row
# counts for the OUTPUT-MAJOR stacks, where XLA's dequant path stays slow:
#   B=256  qkv 2.60x  gateup 2.90x  down 0.55x
#   B=640  qkv 1.61x  gateup 1.21x  down  (no block config)
#   B=1024 qkv 1.02x  gateup 0.91x          <- parity: ceiling
# The reduction-major down stack [4096, 11008] is the exception: XLA runs its
# large-contraction dequant matmul at ~470 GB/s there, beating the kernel at
# every prefill B, so it streams only at decode rows.  Hence the rule in
# _stream_rows_ok: everything streams at B <= 64; O >= D stacks additionally
# stream up to _STREAM_MAX_B; beyond that the pass is compute-bound and the
# XLA dequant path takes over.
# ---------------------------------------------------------------------------

_DECODE_MAX_B = 64      # all stacks stream at decode-shaped row counts
_STREAM_MAX_B = 640     # output-major (O >= D) stacks stream up to here


def _stream_rows_ok(n_rows: int, O: int, D: int) -> bool:
    """Measured dispatch rule: see the block comment above."""
    if n_rows <= _DECODE_MAX_B:
        return True
    return n_rows <= _STREAM_MAX_B and O >= D


# ---------------------------------------------------------------------------
# W8A8: dynamic per-row activation quantization -> int8 x int8 on the MXU.
#
# Prefill is compute-bound (93-94% MXU at 7B shapes, docs/DESIGN.md), and the
# v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate. Measured on a v5e
# chip against the repo's real dispatch path (scripts/bench_w8a8_stack2.py,
# 7B qkv/gateup/down scan, [L,O,D] stacks):
#   B=128  parity (1.00x)      B=256  1.42x
#   B=640  1.38x               B=2560 1.38x  (211.8 TF/s > bf16 peak 197)
# Decode shapes are HBM-bound — W8A8 measured ~0-10% there (round 2) and is
# never taken (the weight-streaming kernel stays the decode path).
#
# Numerics: activations quantize per ROW (dynamic absmax over the model dim),
# weights keep their per-output-channel scales, accumulation is exact int32,
# the scale epilogue is fp32. This is NOT bit-exact with the dequant paths —
# it is an opt-in throughput mode (engine/bench/runner `--quant w8a8`,
# default off); the exact int8 weight-only path remains the accuracy
# configuration. The reference's own load_8bit/load_4bit (builder.py:29-38)
# accept the same kind of speed-for-numerics trade.
# ---------------------------------------------------------------------------

_W8A8_MIN_B = 256  # measured crossover: parity at 128 rows, 1.4x from 256 up


def _w8a8_row_scale(hf: jax.Array, amax: jax.Array) -> jax.Array:
    del hf  # signature symmetry with the quant step
    return jnp.maximum(amax, 1e-30) / 127.0


def _w8a8_quantize(hf: jax.Array, a_scale: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(hf / a_scale), -127.0, 127.0).astype(jnp.int8)


def int8_matmul_w8a8(h: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """h [..., D] x int8 [O, D] (scales [O]) → [..., O] in h.dtype.

    Per-row dynamic activation quant; int32 MXU accumulation; fp32 epilogue
    a_scale[row] * s[col]."""
    hf = h.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    a_scale = _w8a8_row_scale(hf, amax)
    hq = _w8a8_quantize(hf, a_scale)
    acc = jax.lax.dot_general(
        hq, q,
        (((h.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * a_scale * s).astype(h.dtype)


def _round_up(x, m):
    return -(-x // m) * m


def _choose_blocks(O: int, D: int, bB: int):
    """(bO, bD) with double-buffered h/w blocks + acc within ~8MB VMEM."""
    budget = 8 * 2**20

    def fits(bO, bD):
        return 2 * bD * (2 * bB + bO) + 4 * bB * bO <= budget

    for bO in (512, 256, 128):
        if O % bO:
            continue
        bD = D
        while (
            not fits(bO, bD)
            and bD % 2 == 0
            and (bD // 2) % 128 == 0
            and D % (bD // 2) == 0
        ):
            bD //= 2
        if fits(bO, bD):
            return bO, bD
    return None


def _int8_mm_kernel(h_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = h_ref[:]  # [bB, bD] compute dtype
    w = q_ref[:].astype(h.dtype)  # [bO, bD] int8 → dequant on the VPU
    acc_ref[:] += jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul_tpu(
    h: jax.Array, q: jax.Array, s: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """h [B, D] x q int8 [O, D], s [O] → [B, O] (h.dtype). Decode path:
    B is padded to a multiple of 16 (bf16 sublane tile) and kept whole."""
    B, D = h.shape
    O = q.shape[0]
    Bp = _round_up(B, 16)
    blocks = _choose_blocks(O, D, Bp)
    if blocks is None:
        # no viable VMEM block config (odd dims or huge B working set);
        # XLA fallback (within bf16 rounding of the kernel, module header)
        return int8_matmul_xla(h, q, s)
    bO, bD = blocks
    if Bp != B:
        h = jnp.pad(h, ((0, Bp - B), (0, 0)))
    s2 = s.reshape(1, O).astype(jnp.float32)

    out = pl.pallas_call(
        _int8_mm_kernel,
        grid=(O // bO, D // bD),
        in_specs=[
            pl.BlockSpec((Bp, bD), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bO, bD), lambda j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bO), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(h, q, s2)
    return out[:B] if Bp != B else out


# ---------------------------------------------------------------------------
# Stacked-layer variant: the whole [L, O, D] int8 stack stays in HBM and the
# kernel DMAs only layer `li`'s blocks (scalar-prefetch indexing). Inside a
# lax.scan, passing the slice as a pallas operand would materialize a copy of
# the layer's weights every step — tripling HBM traffic; this avoids it.
# ---------------------------------------------------------------------------


def _int8_mm_stacked_kernel(li_ref, h_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = h_ref[:]
    w = q_ref[0].astype(h.dtype)
    acc_ref[:] += jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul_stacked(
    h: jax.Array,
    q: jax.Array,      # [L, O, D] int8
    s: jax.Array,      # [L, O] f32
    layer_idx: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    B, D = h.shape
    L, O = q.shape[0], q.shape[1]
    Bp = _round_up(B, 16)
    blocks = _choose_blocks(O, D, Bp)
    if blocks is None:
        qi = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
        si = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
        return int8_matmul_xla(h, qi, si)
    bO, bD = blocks
    if Bp != B:
        h = jnp.pad(h, ((0, Bp - B), (0, 0)))
    s3 = s.reshape(L, 1, O).astype(jnp.float32)
    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(O // bO, D // bD),
        in_specs=[
            pl.BlockSpec((Bp, bD), lambda j, k, li_ref: (0, k)),
            pl.BlockSpec((1, bO, bD), lambda j, k, li_ref: (li_ref[0], j, k)),
            pl.BlockSpec((1, 1, bO), lambda j, k, li_ref: (li_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
    )
    out = pl.pallas_call(
        _int8_mm_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(li, h, q, s3)
    return out[:B] if Bp != B else out


def int8_matmul_stacked_dispatch(
    h: jax.Array, wq: Dict[str, jax.Array], layer_idx: jax.Array, *, impl: str = "auto",
    act_quant: bool = False,
) -> jax.Array:
    """h [..., D] x stacked quantized [L, O, D] at layer_idx → [..., O].

    Weight-bound row counts take the weight-streaming Pallas kernel — one
    pass over the int8 bytes, no bf16 dequant materialization: decode rows
    for every stack, and short prefills (<= _STREAM_MAX_B) for the
    output-major (O >= D) stacks where it was measured to win; the rest
    takes the XLA dequant path (see the dispatch comment above).

    act_quant=True additionally routes compute-bound row counts
    (>= _W8A8_MIN_B) through the W8A8 int8-MXU path — opt-in, not bit-exact
    (see the W8A8 block comment)."""
    q, s = wq["q"], wq["s"]
    lead = h.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= int(d)
    if act_quant and impl == "auto" and n_rows >= _W8A8_MIN_B:
        qi = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
        si = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
        return int8_matmul_w8a8(h, qi, si)
    if impl == "auto":
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except RuntimeError:
            on_tpu = False
        ok = (
            on_tpu
            and _stream_rows_ok(n_rows, q.shape[1], q.shape[2])
            and _choose_blocks(q.shape[1], q.shape[2], _round_up(n_rows, 16))
            is not None
        )
        impl = "pallas" if ok else "xla"
    if impl in ("pallas", "pallas_interpret"):
        out = int8_matmul_stacked(
            h.reshape(-1, h.shape[-1]), q, s, layer_idx,
            interpret=(impl == "pallas_interpret"),
        )
        return out.reshape(*lead, q.shape[1])
    qi = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
    return int8_matmul_xla(h, qi, si)


def int8_matmul(h: jax.Array, wq: Dict[str, jax.Array], *, impl: str = "auto") -> jax.Array:
    """Dispatcher: h [..., D] x quantized [O, D] → [..., O]."""
    q, s = wq["q"], wq["s"]
    lead = h.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= int(d)
    if impl == "auto":
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except RuntimeError:
            on_tpu = False
        ok = (
            on_tpu
            and _stream_rows_ok(n_rows, q.shape[0], q.shape[1])
            and _choose_blocks(q.shape[0], q.shape[1], _round_up(n_rows, 16))
            is not None
        )
        impl = "pallas" if ok else "xla"
    if impl in ("pallas", "pallas_interpret"):
        h2 = h.reshape(-1, h.shape[-1])
        out = int8_matmul_tpu(h2, q, s, interpret=(impl == "pallas_interpret"))
        return out.reshape(*lead, q.shape[0])
    return int8_matmul_xla(h, q, s)


# ---------------------------------------------------------------------------
# int4 weight-only (group-wise): the 4-bit capability analog of the
# reference's bitsandbytes load_4bit path (builder.py:29-38), TPU-native.
#
# Storage is TRANSPOSED: packed int8 [..., D/2, O] with the contraction dim
# on SUBLANES and output channels on lanes, split-half packed (low nibble =
# logical row d, high nibble = row D/2 + d, so a packed block unpacks into
# two contiguous [bDp, bO] halves). Scales are per (128-row group, output
# channel) absmax/7, stored [..., D/128, O] — the industry-standard w4 g128
# RTN scheme. Per-weight quantization noise is ~12% of a group's scale (vs
# ~0.9% for int8), so int4 is an OPT-IN config — int8 stays the default.
#
# Why transposed (all slope-measured on a v5e chip, L=4 vs L=12 cancels the
# remote-dispatch overhead; scripts/bench_int4_probe*.py,
# bench_int4_stacked.py, bench_int4_transposed.py):
#   * row-major [O, D/2] needs the group scales broadcast along LANES; every
#     formulation of that 128x lane-expansion relayouts (jnp.repeat: whole
#     kernel at 102 GB/s; broadcast_in_dim+minor-merge: 107; an MXU
#     expansion matmul: same) — the scale machinery alone cost ~0.3 ms per
#     stack.
#   * transposed, the expansion is broadcast_in_dim over a NEW LEADING dim +
#     a leading-dim merge — layout-free. Kernel: 350 GB/s raw.
#   * per-channel-scale row-major reached 467 GB/s raw (933 int8-equiv) but
#     per-channel int4 noise (~15%/weight) is not defensible for an
#     accuracy-gated framework.
# Net: 350 GB/s raw = 700 GB/s int8-equivalent vs the int8 kernel's 712 in
# the same harness — int4 decodes AT int8 speed on this chip (the VPU
# unpack+scale work cancels the bandwidth win at decode row counts; both sit
# near the B=16 MXU row-granularity limit) while HALVING weight HBM:
# 7B 6.6 GB -> 3.4 GB, which is what unlocks 13B grouped-POPE serving and
# larger KV budgets on one 16 GB chip.
#
# Unpack widens to i32 on the VPU ((p&15^8)-8 / p>>4) — Mosaic rejects
# shift/compare on i8 vectors, and the pure-bf16 floor-arithmetic variant
# VMEM-OOMs on the down stack. A runtime pl.ds lane slice that is consumed
# crashes this backend's Mosaic (bisected in probe_int4_kernel_bisect.py),
# so per-step scale groups come off STATIC slices (where-chain when nkh>1).
# ---------------------------------------------------------------------------

INT4_GROUP = 128


def int4_auto_group(dims) -> int:
    """Largest power-of-two group <= INT4_GROUP packing every contraction dim
    in `dims` (tiny test configs have D < 256; real llama dims give 128 —
    the only group size the Pallas kernel serves, smaller groups fall back
    to the XLA dequant path)."""
    g = INT4_GROUP
    while g > 1 and any(int(d) % (2 * g) for d in dims):
        g //= 2
    return g


def quantize_weight_int4(w: jax.Array, group: int = INT4_GROUP) -> Dict[str, jax.Array]:
    """[..., O, D] float → {'q4': int8 [..., D/2, O] packed transposed,
    'gs': f32 [..., D/group, O]}. D must be divisible by 2*group (every
    llama/qwen stack dim is: 4096/5120/11008/13824 are all 256-multiples)."""
    wf = w.astype(jnp.float32)
    O, D = wf.shape[-2], wf.shape[-1]
    if D % (2 * group):
        raise ValueError(f"D={D} not divisible by 2*group={2*group}")
    lead = wf.shape[:-2]
    gr = wf.reshape(*lead, O, D // group, group)
    absmax = jnp.max(jnp.abs(gr), axis=-1)
    s = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(gr / s[..., None]), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, O, D)
    lo = q[..., : D // 2] & 0xF
    hi = q[..., D // 2 :] & 0xF
    packed = (lo | (hi << 4)).astype(jnp.int8)          # [..., O, D/2]
    nd = packed.ndim
    perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
    return {
        "q4": jnp.transpose(packed, perm),               # [..., D/2, O]
        "gs": jnp.transpose(s.astype(jnp.float32), perm),  # [..., D/g, O]
    }


def is_quantized_int4(w: Any) -> bool:
    return isinstance(w, dict) and "q4" in w and "gs" in w


def _unpack_int4(q4: jax.Array):
    """packed int8 → (lo, hi) int32 nibble values in [-8, 7]."""
    q32 = q4.astype(jnp.int32)
    return ((q32 & 15) ^ 8) - 8, q32 >> 4


def _dequant_int4_kn(q4: jax.Array, gs: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """packed [..., D/2, O] + scales [..., D/g, O] → dense [..., D, O]."""
    Dp = q4.shape[-2]
    group = 2 * Dp // gs.shape[-2]
    lo, hi = _unpack_int4(q4)
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    s = jnp.repeat(gs, group, axis=-2)
    return (q * s).astype(dtype)


def dequantize_int4(wq: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    """→ dense [..., O, D] (torch convention, matching quantize input)."""
    w = _dequant_int4_kn(wq["q4"], wq["gs"], dtype)
    nd = w.ndim
    perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
    return jnp.transpose(w, perm)


def int4_matmul_xla(h: jax.Array, q4: jax.Array, gs: jax.Array) -> jax.Array:
    """h [..., D] x packed-transposed int4 [D/2, O] (scales [D/g, O]) →
    [..., O], as TWO dots over the packed halves. Dequantizing each half to
    bf16 separately (no concat, no f32 join) keeps the transients to one
    bf16 [D/2, O] buffer per half — the concat formulation materialized
    i32+f32 copies of the full dense weight and OOM'd 7B batched prefill."""
    Dp = q4.shape[0]
    group = 2 * Dp // gs.shape[0]
    nGh = Dp // group
    lo, hi = _unpack_int4(q4)
    s_lo = jnp.repeat(gs[:nGh], group, axis=0)
    s_hi = jnp.repeat(gs[nGh:], group, axis=0)
    w_lo = (lo.astype(jnp.float32) * s_lo).astype(h.dtype)
    w_hi = (hi.astype(jnp.float32) * s_hi).astype(h.dtype)
    dims = (((h.ndim - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        h[..., :Dp], w_lo, dims, preferred_element_type=h.dtype
    ) + jax.lax.dot_general(
        h[..., Dp:], w_hi, dims, preferred_element_type=h.dtype
    )


def _choose_blocks_int4(O: int, Dp: int, bB: int):
    """(bDp, bO) over the transposed packed geometry: double-buffered packed
    block + two h blocks + the layer's full scale rows + fp32 acc within
    ~7.5MB. bO=2048 measured best (bench_int4_transposed.py). The kernel's
    unpack/scale stack temporaries roughly DOUBLE the modeled footprint
    (observed: model 8.0M -> 16.7M scoped, over the 16M hardware limit on
    the 13B down stack), so the budget stays at ~7.5M to keep real usage
    under the cap."""
    budget = int(7.5 * 2**20)
    nG = 2 * Dp // INT4_GROUP

    def fits(bDp, bO):
        return (
            2 * (bDp * bO + 2 * 2 * bB * bDp) + 4 * bB * bO + 4 * nG * bO
            <= budget
        )

    for bO in (2048, 1024, 4096, 512, 256, 128):
        if bO > O or O % bO:
            continue
        bDp = Dp
        while (
            not fits(bDp, bO)
            and bDp % 2 == 0
            and (bDp // 2) % INT4_GROUP == 0
            and Dp % (bDp // 2) == 0
        ):
            bDp //= 2
        if fits(bDp, bO) and bDp % INT4_GROUP == 0:
            return bDp, bO
    return None


def _make_int4_stacked_kernel(nkh: int, bG: int):
    """nkh (D-grid steps) and bG (scale groups per block) are static, so each
    step's scale groups come off STATIC sublane slices (where-chain when
    nkh > 1; plain slice when the whole D fits one block)."""

    def kern(li_ref, hlo_ref, hhi_ref, p_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        h = hlo_ref[:]                       # [B, bDp]
        lo, hi = _unpack_int4(p_ref[0])      # [bDp, bO] i32

        def grp(base):                       # → [bG, bO]
            if nkh == 1:
                return s_ref[0, base : base + bG]
            acc = None
            for kk in range(nkh):
                sl = s_ref[0, base + kk * bG : base + (kk + 1) * bG]
                m = (k == kk).astype(sl.dtype)
                acc = sl * m if acc is None else acc + sl * m
            return acc

        def rep(s):
            # [bG, bO] → [bG*128, bO]: broadcast over a new LEADING dim +
            # leading-dim merge — layout-free on the (sublane, lane) tiling,
            # unlike any lane-direction expansion (see header)
            b = jax.lax.broadcast_in_dim(
                s, (s.shape[0], INT4_GROUP, s.shape[1]), (0, 2)
            )
            return b.reshape(s.shape[0] * INT4_GROUP, s.shape[1])

        nGh = nkh * bG
        w_lo = lo.astype(h.dtype) * rep(grp(0)).astype(h.dtype)
        w_hi = hi.astype(h.dtype) * rep(grp(nGh)).astype(h.dtype)
        acc_ref[:] += jax.lax.dot_general(
            h, w_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_ref[:] += jax.lax.dot_general(
            hhi_ref[:], w_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == nk - 1)
        def _finalize():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_stacked(
    h: jax.Array,
    q4: jax.Array,     # [L, D/2, O] packed int8, transposed
    gs: jax.Array,     # [L, D/group, O] f32
    layer_idx: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    B, D = h.shape
    L, Dp, O = q4.shape
    Bp = _round_up(B, 16)
    blocks = _choose_blocks_int4(O, Dp, Bp)
    if blocks is None or D != 2 * Dp or 2 * Dp != INT4_GROUP * gs.shape[1]:
        # no viable block config / mismatched shapes / non-128 group size
        qi = jax.lax.dynamic_index_in_dim(q4, layer_idx, 0, keepdims=False)
        si = jax.lax.dynamic_index_in_dim(gs, layer_idx, 0, keepdims=False)
        return int4_matmul_xla(h, qi, si)
    bDp, bO = blocks
    if Bp != B:
        h = jnp.pad(h, ((0, Bp - B), (0, 0)))
    nkh = Dp // bDp
    nG = gs.shape[1]
    bG = bDp // INT4_GROUP
    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(O // bO, nkh),
        in_specs=[
            pl.BlockSpec((Bp, bDp), lambda j, k, li_ref: (0, k)),
            pl.BlockSpec((Bp, bDp), lambda j, k, li_ref: (0, k + nkh)),
            pl.BlockSpec((1, bDp, bO), lambda j, k, li_ref: (li_ref[0], k, j)),
            pl.BlockSpec((1, nG, bO), lambda j, k, li_ref: (li_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_int4_stacked_kernel(nkh, bG),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(li, h, h, q4, gs)
    return out[:B] if Bp != B else out


def int4_matmul_stacked_dispatch(
    h: jax.Array, wq: Dict[str, jax.Array], layer_idx: jax.Array, *, impl: str = "auto"
) -> jax.Array:
    """h [..., D] x stacked transposed int4 [L, D/2, O] at layer_idx →
    [..., O].

    EVERY row count streams through the Pallas kernel when a block config
    exists — unlike int8, the XLA fallback must materialize the dense bf16
    weights (the nibble unpack + concat defeats fusion into the matmul), so
    the kernel wins at prefill too (slope-measured 7B stacks,
    scripts/bench_int4_prefill.py: 2.7x at B=256, 2.0x at B=640, 1.6x at
    B=1024, 1.3x at B=2048)."""
    q4, gs = wq["q4"], wq["gs"]
    lead = h.shape[:-1]
    n_rows = 1
    for d in lead:
        n_rows *= int(d)
    if impl == "auto":
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except RuntimeError:
            on_tpu = False
        ok = (
            on_tpu
            and 2 * q4.shape[1] == INT4_GROUP * gs.shape[1]  # kernel assumes g=128
            and _choose_blocks_int4(q4.shape[2], q4.shape[1], _round_up(n_rows, 16))
            is not None
        )
        impl = "pallas" if ok else "xla"
    if impl in ("pallas", "pallas_interpret"):
        out = int4_matmul_stacked(
            h.reshape(-1, h.shape[-1]), q4, gs, layer_idx,
            interpret=(impl == "pallas_interpret"),
        )
        return out.reshape(*lead, q4.shape[2])
    qi = jax.lax.dynamic_index_in_dim(q4, layer_idx, 0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(gs, layer_idx, 0, keepdims=False)
    # 2D in, 2D out: without the reshapes XLA propagated the [K, N] dot's
    # layout preference through the qkv projection into the KV cache and
    # inserted a cache-sized transposing copy (observed: +4.5GB HBM, OOM at
    # 7B batched prefill)
    out = int4_matmul_xla(h.reshape(-1, h.shape[-1]), qi, si)
    return out.reshape(*lead, q4.shape[2])


# ---------------------------------------------------------------------------
# llama param-tree quantization
# ---------------------------------------------------------------------------

_LLAMA_QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llama_params(
    params: Dict[str, Any], fuse: bool = True, bits: int = 8,
    group: Optional[int] = None,
) -> Dict[str, Any]:
    """Quantize the hot llama linears (stacked [L, O, D]) + lm_head; the
    embedding table stays as-is (it is gathered, not matmul'd).

    fuse=True packs q|k|v into one [L, QD+2*KD, D] 'qkv' stack and gate|up
    into one 'gateup' stack: one kernel launch streams all three (two)
    weights per sublayer — fewer launches and larger contiguous DMA. int8
    scales are per-output-channel and int4 group scales run along the
    contraction dim, so quantizing the concatenation is bit-identical to
    quantizing the parts either way.

    bits=4 (the reference's load_4bit capability analog) uses the group-wise
    int4 scheme for the layer stacks; the lm_head stays int8 — it runs once
    per token (~2% of decode weight bytes) and the logits gate every
    accuracy metric, so the near-lossless path is kept there."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if bits == 4 and group is None:
        # derive the largest packing group from the actual contraction dims
        # (128 for every real llama; tiny test configs shrink)
        group = int4_auto_group(
            params["layers"][k].shape[-1] for k in _LLAMA_QUANT_KEYS
        )
    qw1 = (
        functools.partial(quantize_weight_int4, group=group)
        if bits == 4
        else quantize_weight
    )

    def qcat(*ws):
        # int4's grouped-absmax/pack/transpose pipeline materializes f32
        # intermediates the size of the stack; at real 7B/13B widths that
        # (plus the fused concat) OOMs a 16GB chip on top of the live bf16
        # tree — quantize a few layers at a time and stitch the results
        L = int(ws[0].shape[0]) if ws[0].ndim == 3 else 1
        step = L if (bits == 8 or ws[0].ndim != 3 or L <= 4) else 4
        outs = []
        for i in range(0, L, step):
            chunk = (
                jnp.concatenate([w[i : i + step] for w in ws], axis=1)
                if len(ws) > 1
                else ws[0][i : i + step]
            )
            outs.append(jax.block_until_ready(qw1(chunk)))
        if len(outs) == 1:
            return outs[0]
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }

    out = dict(params)
    layers = dict(params["layers"])
    if fuse:
        layers["qkv"] = qcat(layers.pop("q"), layers.pop("k"), layers.pop("v"))
        layers["gateup"] = qcat(layers.pop("gate"), layers.pop("up"))
        layers["o"] = qcat(layers["o"])
        layers["down"] = qcat(layers["down"])
    else:
        for k in _LLAMA_QUANT_KEYS:
            layers[k] = qcat(params["layers"][k])
    out["layers"] = layers
    out["lm_head"] = quantize_weight(params["lm_head"])
    return out


def quantize_qwen_params(params: Dict[str, Any], fuse: bool = True) -> Dict[str, Any]:
    """int8 weight-only for the Qwen decoder (models/qwen.py layout).

    c_attn_w is already the packed qkv stack; fuse=True additionally packs
    w1|w2 into one 'w12' stack (per-output-channel scales make concat
    quantization bit-identical to the parts). c_attn_b stays dense (bias
    add after the quant matmul). The reference capability analog is the
    bitsandbytes loader (builder.py:29-38) — which never covered Qwen."""
    out = dict(params)
    layers = dict(params["layers"])
    layers["c_attn_w"] = quantize_weight(layers["c_attn_w"])
    layers["attn_proj"] = quantize_weight(layers["attn_proj"])
    if fuse:
        layers["w12"] = quantize_weight(
            jnp.concatenate([layers.pop("w1"), layers.pop("w2")], axis=1)
        )
    else:
        layers["w1"] = quantize_weight(layers["w1"])
        layers["w2"] = quantize_weight(layers["w2"])
    layers["mlp_proj"] = quantize_weight(layers["mlp_proj"])
    out["layers"] = layers
    out["lm_head"] = quantize_weight(params["lm_head"])
    return out


# ---------------------------------------------------------------------------
# Tensor-parallel int8: shard_map around the weight-streaming kernel.
#
# GSPMD cannot partition an opaque Pallas custom call, so TP for int8 stacks
# is expressed manually: column-parallel stacks (qkv/gateup/q/k/v/gate/up)
# shard the output dim and return sharded activations; row-parallel stacks
# (o/down) shard the contraction dim, psum the partial products, and apply
# the per-output-channel scales after the reduction. Each device runs the
# same kernel on its local [L, O/n, D] (or [L, O, D/n]) shard — the Megatron
# dataflow with the kernel's full bandwidth per chip.
# ---------------------------------------------------------------------------

_ROW_PARALLEL_NAMES = ("o", "down", "attn_proj", "mlp_proj", "out", "fc2", "down_proj")


def int8_tp_mode(name: str) -> str:
    return "row" if name in _ROW_PARALLEL_NAMES else "column"


def int8_tp_aligned(wq: Dict[str, Any], mode: str, n_shards: int) -> bool:
    """Per-shard dims must stay lane-aligned (multiples of 128)."""
    O, D = int(wq["q"].shape[1]), int(wq["q"].shape[2])
    dim = O if mode == "column" else D
    return dim % n_shards == 0 and (dim // n_shards) % 128 == 0


def pad_quantized_stack(
    wq: Dict[str, jax.Array], mode: str, n_shards: int, halves: int = 1
):
    """Lane-align an int8 [L, O, D] stack for n-way TP by padding (bit-inert).

    column: each of the `halves` equal O-parts (fused gateup has two — padding
    per part keeps the consumer's split at O//halves valid) gains zero rows
    (q=0) with unit scales, so the padded output channels are exactly 0 and
    unused. row: the contraction dim D gains zero columns, contributing
    exactly 0 to the reduction (the matching column-stack padding produces the
    zero activation columns they multiply). Returns (stack, changed).
    """
    q, s = wq["q"], wq["s"]
    L, O, D = (int(d) for d in q.shape)
    u = 128 * n_shards
    if mode == "column":
        part = O // halves
        part_pad = _round_up(part, u)
        if part_pad == part:
            return wq, False
        pad = part_pad - part
        qs, ss = [], []
        for h in range(halves):
            qs.append(
                jnp.pad(q[:, h * part : (h + 1) * part], ((0, 0), (0, pad), (0, 0)))
            )
            ss.append(
                jnp.pad(
                    s[:, h * part : (h + 1) * part],
                    ((0, 0), (0, pad)),
                    constant_values=1.0,
                )
            )
        return {"q": jnp.concatenate(qs, axis=1), "s": jnp.concatenate(ss, axis=1)}, True
    d_pad = _round_up(D, u)
    if d_pad == D:
        return wq, False
    return {"q": jnp.pad(q, ((0, 0), (0, 0), (0, d_pad - D))), "s": s}, True


def pad_llama_quantized_for_tp(layers: Dict[str, Any], n_shards: int):
    """Pad the MLP int8 stacks (gateup/gate/up column, down row) so 7B-style
    intermediate sizes (11008: 128-aligned only at TP<=4) shard at any
    power-of-two TP degree. gate/up and down pad to the same F_pad, so the
    zero activation columns line up with down's zero contraction columns.
    The attention stacks (qkv/q/k/v/o) are head-structured and already
    lane-aligned for every supported checkpoint (head_dim 128); they are left
    untouched — if one misaligns, the caller's readiness check still fails
    and the engine falls back to replication. Returns (layers, changed)."""
    out = dict(layers)
    changed = False
    for name, halves in (("gateup", 2), ("gate", 1), ("up", 1)):
        if name in out and is_quantized(out[name]):
            out[name], ch = pad_quantized_stack(out[name], "column", n_shards, halves)
            changed |= ch
    if "down" in out and is_quantized(out["down"]):
        out["down"], ch = pad_quantized_stack(out["down"], "row", n_shards)
        changed |= ch
    return out, changed


def int8_matmul_stacked_tp(
    h: jax.Array,
    wq: Dict[str, jax.Array],
    layer_idx: jax.Array,
    mesh,
    mode: str,
    *,
    axis: str = "model",
    interpret: Optional[bool] = None,
    act_quant: bool = False,
) -> jax.Array:
    """Sharded int8 stacked matmul (Megatron column/row dataflow, see the
    block comment above).

    act_quant=True routes compute-bound row counts (>= _W8A8_MIN_B) through
    the W8A8 int8-MXU path — bit-identical to the single-device
    int8_matmul_w8a8: column shards see the full contraction dim so the
    per-row activation scales match trivially; row shards pmax the row absmax
    across the axis (max is associative), psum the EXACT int32 partial
    products (integer addition is associative — no FP reduction-order drift),
    and apply the identical fp32 a_scale*s epilogue after the reduction."""
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except RuntimeError:
            interpret = True
    q, s = wq["q"], wq["s"]
    lead = h.shape[:-1]
    h2 = h.reshape(-1, h.shape[-1])
    li = jnp.asarray(layer_idx, jnp.int32)
    w8a8 = act_quant and h2.shape[0] >= _W8A8_MIN_B

    # per-shard geometry decides streaming: column shards shrink O, row
    # shards shrink D — apply the measured rule to the shapes the kernel
    # will actually see on each device
    n_shards = mesh.shape[axis]
    if mode == "column":
        o_shard, d_shard = q.shape[1] // n_shards, q.shape[2]
    else:
        o_shard, d_shard = q.shape[1], q.shape[2] // n_shards
    decode_rows = _stream_rows_ok(h2.shape[0], o_shard, d_shard)

    if mode == "column":

        def col_body(h_, q_, s_, li_):
            qi = jax.lax.dynamic_index_in_dim(q_, li_, 0, keepdims=False)
            si = jax.lax.dynamic_index_in_dim(s_, li_, 0, keepdims=False)
            if w8a8:
                # full-D rows per shard → a_scale identical to single-device
                return int8_matmul_w8a8(h_, qi, si)
            if decode_rows:
                return int8_matmul_stacked(h_, q_, s_, li_, interpret=interpret)
            return int8_matmul_xla(h_, qi, si)

        f = jax.shard_map(
            col_body,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None), P(None, axis), P()),
            out_specs=P(None, axis),
            check_vma=False,
        )
        out = f(h2, q, s, li)
    elif w8a8:

        def row_body_w8a8(h_, q_, s_, li_):
            hf = h_.astype(jnp.float32)
            local_amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
            amax = jax.lax.pmax(local_amax, axis)  # global row absmax
            a_scale = _w8a8_row_scale(hf, amax)
            hq = _w8a8_quantize(hf, a_scale)
            qi = jax.lax.dynamic_index_in_dim(q_, li_, 0, keepdims=False)
            si = jax.lax.dynamic_index_in_dim(s_, li_, 0, keepdims=False)
            acc = jax.lax.dot_general(
                hq, qi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = jax.lax.psum(acc, axis)  # exact: int32 partials
            return (acc.astype(jnp.float32) * a_scale * si).astype(h_.dtype)

        f = jax.shard_map(
            row_body_w8a8,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, None, axis), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        out = f(h2, q, s, li)
    else:

        def row_body(h_, q_, li_):
            ones = jnp.ones(q_.shape[:2], jnp.float32)
            if decode_rows:
                part = int8_matmul_stacked(h_, q_, ones, li_, interpret=interpret)
            else:
                qi = jax.lax.dynamic_index_in_dim(q_, li_, 0, keepdims=False)
                part = int8_matmul_xla(h_, qi, jnp.ones((q_.shape[1],), jnp.float32))
            return jax.lax.psum(part, axis)

        f = jax.shard_map(
            row_body,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, None, axis), P()),
            out_specs=P(),
            check_vma=False,
        )
        scale = jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False)
        out = f(h2, q, li) * scale[None, :].astype(h2.dtype)
    return out.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# KV-cache int8 quantization (per-token, per-head absmax scales)
# ---------------------------------------------------------------------------
# The decode step's non-weight HBM traffic is dominated by KV-cache reads
# (BENCH_r04 decode_weight_gbps_frac_of_ceiling=0.842 with ~3 ms residual);
# storing K/V as int8 with one f32 scale per (row, position, head) halves
# those bytes at a ~1/256 relative quantization error. The reference has no
# cache optimization at all (each branch keeps an fp16 HF cache,
# vcd_sample.py:269-277); this extends the load_8bit serving intent of
# llava/model/builder.py:29-38 to the cache.


def kv_quantize_block(x: jax.Array):
    """[..., Dh] float → (int8 [..., Dh], f32 scale [..., 1]) with per-vector
    absmax scaling. Exact zeros stay exact; a zero vector quantizes to zeros
    with scale 0 (dequant reproduces zeros — padded cache slots stay inert)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    return q, scale


def kv_dequantize(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """(int8 [..., Dh], f32 [..., 1]) → [..., Dh] in `dtype`. Written as a
    single elementwise multiply so XLA fuses it into the consuming attention
    dot's operand read — the HBM traffic stays int8 + scales."""
    return (q.astype(jnp.float32) * scale).astype(dtype)
