"""Shared runner infrastructure: model/tokenizer loading, prompt building,
dataset chunking, resumable jsonl answer files.

Capability parity with the reference eval scripts' shared plumbing
(experiments/eval/calibrate/llava_calibrate.py:91-160, llava_naive.py:28-66,
MME/run_llava.py:32-43 split_list/get_chunk) — written fresh, TPU-first.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
)
from llava_align_tpu.conversation import conv_templates


def split_list(lst: Sequence, n: int) -> List[Sequence]:
    """Split into n (roughly) equal chunks (reference MME/run_llava.py:32-38)."""
    chunk_size = math.ceil(len(lst) / n)
    return [lst[i : i + chunk_size] for i in range(0, len(lst), chunk_size)]


def get_chunk(
    lst: Sequence, n: int, k: int, *, allow_out_of_range: bool = False
) -> Sequence:
    chunks = split_list(lst, n)
    # ceil chunking can yield FEWER than n chunks (6 items / 4 chunks of 2
    # -> 3 chunks). Under --dist auto a rank past the end must hold an empty
    # shard so it never crashes and hangs the others at the merge barrier;
    # for a USER-typed --chunk-idx an empty answers file would silently hide
    # the typo, so keep the reference's IndexError (MME/run_llava.py:41)
    if k < len(chunks):
        return chunks[k]
    if allow_out_of_range:
        return lst[:0]
    raise IndexError(
        f"chunk_idx {k} out of range: {len(lst)} items split into "
        f"{len(chunks)} chunks (num_chunks={n})"
    )


def load_questions(
    path: str, num_chunks: int = 1, chunk_idx: int = 0,
    *, allow_out_of_range: bool = False,
) -> List[dict]:
    with open(os.path.expanduser(path)) as f:
        # some checked-in reference splits (data/POPE/coco/test_samples.json)
        # carry hand-edited trailing commas on jsonl lines; tolerate them
        questions = [
            json.loads(line.strip().rstrip(","))
            for line in f
            if line.strip().rstrip(",")
        ]
    if num_chunks > 1:
        questions = list(
            get_chunk(questions, num_chunks, chunk_idx,
                      allow_out_of_range=allow_out_of_range)
        )
    return questions


def load_questions_for(args) -> List[dict]:
    """load_questions wired to the runner arg namespace: chunk indices set
    by --dist auto may exceed the ceil-chunk count (empty shard), while
    user-typed --num-chunks/--chunk-idx out-of-range raises."""
    return load_questions(
        args.question_file, args.num_chunks, args.chunk_idx,
        allow_out_of_range=getattr(args, "dist_merge_target", None) is not None,
    )


def apply_dist_auto(args) -> bool:
    """--dist auto: initialize jax.distributed (from JAX_COORDINATOR_ADDRESS
    etc.), shard the eval set by process rank, and write per-rank answer
    parts. Replaces the reference's manual --num-chunks/--chunk-idx +
    CUDA_VISIBLE_DEVICES fan-out (eval/sampling/run.sh:17-25) with
    jax.process_index sharding. Returns True when multi-process."""
    if getattr(args, "dist", "none") != "auto":
        return False
    from llava_align_tpu.parallel.dist import (
        get_rank,
        get_world_size,
        init_distributed_mode,
    )

    if not init_distributed_mode():
        return False
    n, r = get_world_size(), get_rank()
    args.num_chunks, args.chunk_idx = n, r
    args.dist_merge_target = args.answers_file  # finish_dist_auto merges here
    root, ext = os.path.splitext(args.answers_file)
    args.answers_file = f"{root}.rank{r}-of-{n}{ext}"
    return True


def finish_dist_auto(args) -> str:
    """Counterpart of apply_dist_auto, called after the answer loop: barrier
    all processes (every rank's part file is complete once its run() loop
    returns), then rank 0 concatenates the parts into the originally
    requested answers file. Returns the merged path on rank 0, the per-rank
    part path elsewhere. No-op (returns args.answers_file) when --dist auto
    was not active."""
    target = getattr(args, "dist_merge_target", None)
    if target is None:
        return args.answers_file
    from jax.experimental import multihost_utils

    from llava_align_tpu.parallel.dist import get_rank, get_world_size

    multihost_utils.sync_global_devices("llava_align_tpu.answers_merge")
    if get_rank() != 0:
        return args.answers_file
    return merge_chunk_files(target, get_world_size())


def merge_chunk_files(answers_file: str, world_size: int) -> str:
    """Concatenate per-rank `.rank{r}-of-{n}` parts (written under
    --dist auto) back into `answers_file`. Chunks are contiguous slices
    (split_list), so rank-order concatenation restores question order."""
    root, ext = os.path.splitext(os.path.expanduser(answers_file))
    parts = [f"{root}.rank{r}-of-{world_size}{ext}" for r in range(world_size)]
    # AnswerFile creates every rank's part eagerly on open (even for an
    # empty shard), so a missing part means a failed/misconfigured rank —
    # merging around it would hand scoring a silently truncated answers file
    missing = [p for p in parts if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"answer part(s) missing at merge — did those ranks fail? {missing}"
        )
    with open(os.path.expanduser(answers_file), "w") as out:
        for part in parts:
            with open(part) as f:
                out.write(f.read())
    return answers_file


class AnswerFile:
    """Append-only jsonl answers with skip-done resume (the reference relies
    on per-line flush for crude resumability, llava_calibrate.py:219;
    here resume is first-class)."""

    def __init__(self, path: str, resume: bool = False):
        self.path = os.path.expanduser(path)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self.done_ids = set()
        self.done_keys = set()
        if resume and os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                        self.done_ids.add(rec["question_id"])
                        self.done_keys.add((rec["question_id"], rec.get("prompt")))
                    except Exception:
                        pass
            self._f = open(self.path, "a")
        else:
            self._f = open(self.path, "w")

    def is_done(self, question_id, prompt=None) -> bool:
        """Resume check. Pass the question text too when ids are not unique —
        MME reuses the image name as question_id for both of its questions
        per image (reference llava_mme.jsonl), so id-only dedup would drop
        every second question on resume."""
        if prompt is None:
            return question_id in self.done_ids
        return (question_id, prompt) in self.done_keys

    def write(self, record: dict) -> None:
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def build_prompt(
    question: str,
    conv_mode: str,
    *,
    with_image: bool = True,
    mm_use_im_start_end: bool = False,
    one_word: bool = False,
    suffix: str = "",
) -> Tuple[str, str]:
    """Returns (prompt, stop_str). Mirrors llava_calibrate.py:136-144 /
    llava_naive.py:43-53."""
    qs = question
    if with_image:
        if mm_use_im_start_end:
            qs = (
                DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN
                + "\n" + qs
            )
        else:
            qs = DEFAULT_IMAGE_TOKEN + "\n" + qs
    if one_word:
        qs = qs + " Please answer this question with one word."
    if suffix:
        qs = qs + suffix
    conv = conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt(), conv.stop_str


def postprocess_answer(text: str, stop_str: str) -> str:
    """Trim at the stop keyword (reference llava_calibrate.py:202-207 plus
    first-occurrence truncation for strings the token matcher couldn't see)."""
    text = text.strip()
    if stop_str:
        pos = text.find(stop_str)
        if pos >= 0:
            text = text[:pos]
    return text.strip()


def load_image_tensor(
    image_folder: str,
    image_file: str,
    *,
    image_size: int = 336,
    image_aspect_ratio: Optional[str] = None,
    synthetic_ok: bool = False,
    grid_pinpoints=None,
    transfer: str = "uint8",
) -> np.ndarray:
    """CLIP-preprocessed [3, H, W]. transfer='uint8' (default) returns raw
    resized pixels — the DecodeEngine normalizes in-jit (normalize_device),
    4x less host→device traffic, identical math. transfer='float32' returns
    host-normalized floats (callers that feed the model directly, e.g.
    parity_check). anyres grids always return float32 stacks. With
    synthetic_ok, a deterministic noise image replaces missing files."""
    from llava_align_tpu.ops.image import clip_preprocess_pil, clip_resize_pil_uint8

    path = os.path.join(image_folder, image_file) if image_folder else image_file
    if os.path.exists(path):
        from PIL import Image

        img = Image.open(path)
        if image_aspect_ratio == "anyres":
            from llava_align_tpu.ops.anyres import process_anyres_image

            pinpoints = grid_pinpoints or [
                (image_size, image_size * 2), (image_size * 2, image_size),
                (image_size * 2, image_size * 2),
            ]
            return process_anyres_image(img, pinpoints, image_size, image_size)
        if transfer == "uint8":
            return clip_resize_pil_uint8(img, image_size, image_aspect_ratio)
        return clip_preprocess_pil(img, image_size, image_aspect_ratio)
    if not synthetic_ok:
        raise FileNotFoundError(path)
    rng = np.random.default_rng(zlib.crc32(image_file.encode()))
    raw = rng.integers(0, 256, (image_size, image_size, 3), dtype=np.uint8)
    from PIL import Image

    if transfer == "uint8":
        return clip_resize_pil_uint8(Image.fromarray(raw), image_size, None)
    return clip_preprocess_pil(Image.fromarray(raw), image_size, None)


# ---------------------------------------------------------------------------
# model loading
# ---------------------------------------------------------------------------


class MockTokenizer:
    """Deterministic offline tokenizer for smoke runs (no checkpoint files).
    One id per character, BOS=1, EOS=2; decode maps back to characters."""

    bos_token_id = 1
    eos_token_id = 2
    unk_token_id = 0
    pad_token_id = 0

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [min(ord(c), 255) + 3 for c in text]
        return r

    def decode(self, ids, skip_special_tokens=True):
        if isinstance(ids, (int, np.integer)):
            ids = [ids]
        out = []
        for t in ids:
            t = int(t)
            if t >= 3:
                out.append(chr(t - 3))
            elif not skip_special_tokens:
                out.append({0: "<unk>", 1: "<s>", 2: "</s>"}[t])
        return "".join(out)


@dataclasses.dataclass
class LoadedModel:
    tokenizer: Any
    params: Dict[str, Any]
    cfg: LlavaConfig
    model_name: str


def load_model(model_path: str, dtype=None, quant: str = "none") -> LoadedModel:
    """Load a llava checkpoint dir, or a synthetic model for offline smoke:
    'random:tiny' | 'random:7b' | 'random:13b'. For random sizes, quant
    ('int8'/'int4') builds the quantized tree directly, group by group —
    quantizing beside a live bf16 7B/13B tree would OOM a 16GB chip."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    if model_path.startswith("random:"):
        size = model_path.split(":", 1)[1]
        from llava_align_tpu.models import llava as llava_model

        if size == "tiny":
            cfg = LlavaConfig.tiny(vocab_size=512)
        elif size == "7b":
            cfg = LlavaConfig.llava_v15_7b()
        elif size == "13b":
            cfg = LlavaConfig.llava_v15_13b()
        else:
            raise ValueError(size)
        if quant in ("int8", "int4") and size != "tiny":
            from llava_align_tpu.utils.synthetic import build_random_llava_params

            params = build_random_llava_params(cfg, quant=quant)
        else:
            params = jax.jit(lambda k: llava_model.init(k, cfg))(jax.random.PRNGKey(0))
        return LoadedModel(MockTokenizer(), params, cfg, f"random-{size}")

    from transformers import AutoTokenizer

    from llava_align_tpu.tokenization import get_model_name_from_path
    from llava_align_tpu.utils.hf_convert import load_llava_checkpoint

    params, cfg = load_llava_checkpoint(os.path.expanduser(model_path), dtype)
    try:  # slow (sentencepiece) tokenizer when available, fast otherwise
        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=False)
    except Exception:
        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
    return LoadedModel(tokenizer, params, cfg, get_model_name_from_path(model_path))


def make_generation_config(args, **overrides) -> GenerationConfig:
    """argparse namespace (reference knob names) → GenerationConfig."""
    temp = getattr(args, "temperature", 1.0)
    kw = dict(
        max_new_tokens=getattr(args, "max_new_tokens", 64),
        do_sample=temp > 0,
        temperature=temp if temp > 0 else 1.0,
        top_p=getattr(args, "top_p", None),
        top_k=getattr(args, "top_k", None),
        seed=getattr(args, "seed", 42),
        use_cd=getattr(args, "use_cd", False),
        use_dd=getattr(args, "use_dd", False),
        use_dd_unk=getattr(args, "use_dd_unk", False),
        cd_alpha=getattr(args, "cd_alpha", 1.0),
        cd_beta=getattr(args, "cd_beta", 0.1),
        noise_step=getattr(args, "noise_step", 500),
    )
    kw.update(overrides)
    return GenerationConfig(**kw)


def mock_tokenize(texts, vocab: int = 64, length: int = 16):
    """Deterministic offline-smoke tokenizer shared by the config-driven
    train/evaluate CLIs: stable crc32 word hashing (process-independent,
    unlike str hash) → ([N, length] ids, mask). Real checkpoints need a real
    tokenizer — pass run.tokenizer_path in the CLI configs."""
    import zlib

    import numpy as np

    vocab = min(int(vocab), 30000)
    ids = np.zeros((len(texts), length), np.int64)
    for i, t in enumerate(texts):
        for j, w in enumerate(str(t).split()[:length]):
            ids[i, j] = zlib.crc32(w.encode()) % (vocab - 2) + 1
    return ids, (ids != 0).astype(np.int64)


def resolve_tokenizer(run_cfg, vocab: int):
    """run.tokenizer_path → BertTokenizerFast over a local vocab file;
    otherwise the crc32 mock (offline smoke). Returns texts → (ids, mask)."""
    import numpy as np

    path = run_cfg.get("tokenizer_path")
    if path:
        from transformers import BertTokenizerFast

        tok = BertTokenizerFast(vocab_file=path)

        def real(texts, length: int = 32):
            out = tok(
                list(map(str, texts)), padding="max_length", truncation=True,
                max_length=length, return_tensors="np",
            )
            return out["input_ids"].astype(np.int64), out["attention_mask"].astype(np.int64)

        return real
    import logging

    logging.getLogger(__name__).info(
        "no run.tokenizer_path — using the offline crc32 mock tokenizer "
        "(metrics are smoke-only for real checkpoints)"
    )
    return lambda texts, length=16: mock_tokenize(texts, vocab=vocab, length=length)
