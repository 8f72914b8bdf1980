"""End-to-end runner smoke: synthetic POPE questions → pope runner (tiny
random model, mock tokenizer, synthetic images, dual-branch VDD + calibrate
dumps) → both scorers consume the produced jsonl."""

import json
import os

import pytest

from llava_align_tpu.evals.pope import load_jsonl, score_pope, score_pope_calibrated
from llava_align_tpu.runners import pope


@pytest.fixture(scope="module")
def question_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("pope_data")
    qf = d / "tiny_POPE_questions.json"
    with open(qf, "w") as f:
        for i in range(4):
            f.write(
                json.dumps(
                    {
                        "question_id": i,
                        "image": f"img_{i}.jpg",
                        "text": f"Is there a dog in the image #{i}?",
                        "label": "yes" if i % 2 == 0 else "no",
                    }
                )
                + "\n"
            )
    return str(qf)


def _args(question_file, answers_file, **kw):
    parser = pope.build_parser()
    args = parser.parse_args(
        [
            "--model-path", "random:tiny",
            "--question-file", question_file,
            "--answers-file", answers_file,
        ]
    )
    args.synthetic_images = True
    args.max_new_tokens = 4
    args.temperature = 0.0  # greedy for determinism
    args.verbose = False
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def test_runner_end_to_end_with_calibrate(question_file, tmp_path):
    out = str(tmp_path / "answers.jsonl")
    args = _args(question_file, out, use_dd=True, use_dd_unk=True, calibrate=True)
    pope.run(args)

    gen = load_jsonl(out)
    assert len(gen) == 4
    for rec in gen:
        assert set(["question_id", "text", "naive", "none", "unk", "logits_score"]) <= set(rec)
        assert isinstance(rec["naive"], dict) and len(rec["naive"]) >= 1

    gt = load_jsonl(question_file)
    plain = score_pope(gt, gen)
    assert 0.0 <= plain["accuracy"] <= 1.0
    cal = score_pope_calibrated(gt, gen, settings=("naive", "none", "unk", "none_unk"))
    assert set(cal) == {"naive", "none", "unk", "none_unk"}


def test_runner_resume_skips_done(question_file, tmp_path):
    out = str(tmp_path / "answers.jsonl")
    args = _args(question_file, out, max_questions=2)
    pope.run(args)
    assert len(load_jsonl(out)) == 2
    args2 = _args(question_file, out, resume=True)
    pope.run(args2)
    recs = load_jsonl(out)
    assert len(recs) == 4
    assert sorted(r["question_id"] for r in recs) == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def grouped_question_file(tmp_path_factory):
    """POPE-shaped: consecutive questions share an image (6 per image in the
    real splits; 3+3 here)."""
    d = tmp_path_factory.mktemp("pope_grouped")
    qf = d / "grouped_POPE_questions.json"
    objs = ["dog", "car", "person", "chair", "cat", "tree"]
    with open(qf, "w") as f:
        for i in range(6):
            f.write(
                json.dumps(
                    {
                        "question_id": i,
                        "image": f"img_{i // 3}.jpg",
                        "text": f"Is there a {objs[i]} in the image?",
                        "label": "yes" if i % 2 == 0 else "no",
                    }
                )
                + "\n"
            )
    return str(qf)


def test_runner_group_by_image_matches_ungrouped(grouped_question_file, tmp_path):
    """Shared-prefix image grouping is a pure execution-layout change: greedy
    answers must match the ungrouped run exactly."""
    out_g = str(tmp_path / "grouped.jsonl")
    pope.run(_args(grouped_question_file, out_g, use_dd=True, use_dd_unk=True))
    out_u = str(tmp_path / "ungrouped.jsonl")
    pope.run(
        _args(grouped_question_file, out_u, use_dd=True, use_dd_unk=True,
              group_by_image=False)
    )
    gen_g = {r["question_id"]: r["text"] for r in load_jsonl(out_g)}
    gen_u = {r["question_id"]: r["text"] for r in load_jsonl(out_u)}
    assert gen_g == gen_u and len(gen_g) == 6

    # multi-group batching (2 image-groups per jitted call) is also layout-only
    out_m = str(tmp_path / "multigroup.jsonl")
    pope.run(
        _args(grouped_question_file, out_m, use_dd=True, use_dd_unk=True,
              group_batch=2)
    )
    gen_m = {r["question_id"]: r["text"] for r in load_jsonl(out_m)}
    assert gen_m == gen_u


def test_runner_calibrate_pipelined_matches_ungrouped(grouped_question_file, tmp_path):
    """The pipelined calibrate path (main + none/unk submitted before the
    previous chunk collects) must write the same answers AND the same
    content-free top-k dumps as the unpipelined ungrouped run."""
    out_g = str(tmp_path / "cal_grouped.jsonl")
    pope.run(
        _args(grouped_question_file, out_g, use_dd=True, use_dd_unk=True,
              calibrate=True)
    )
    out_u = str(tmp_path / "cal_ungrouped.jsonl")
    pope.run(
        _args(grouped_question_file, out_u, use_dd=True, use_dd_unk=True,
              calibrate=True, group_by_image=False)
    )
    g = {r["question_id"]: r for r in load_jsonl(out_g)}
    u = {r["question_id"]: r for r in load_jsonl(out_u)}
    assert g.keys() == u.keys() and len(g) == 6
    for qid in g:
        assert g[qid]["text"] == u[qid]["text"]
        for name in ("naive", "none", "unk"):
            gk, uk = g[qid][name], u[qid][name]
            assert set(gk) == set(uk), (qid, name)
            for tok in gk:
                assert abs(gk[tok] - uk[tok]) < 1e-5, (qid, name, tok)


def test_runner_anyres_groups_fall_back_per_question(grouped_question_file, tmp_path):
    """anyres grid stacks ([K,3,H,W]) are per-question engine inputs; with
    image grouping ON the runner must fall back to engine.generate instead of
    feeding 4-D stacks into the grouped path (code-review regression fix)."""
    out = str(tmp_path / "anyres.jsonl")
    args = _args(grouped_question_file, out, use_dd=True, use_dd_unk=True)
    args.image_aspect_ratio = "anyres"
    pope.run(args)
    recs = load_jsonl(out)
    assert len(recs) == 6 and all(isinstance(r["text"], str) for r in recs)


def test_runner_vcd_grouped_end_to_end(grouped_question_file, tmp_path):
    """VCD (use_cd) rides the shared-prefix grouped path: the noised image
    gets its own prefix segment per group. Deterministic under the seed."""
    out1 = str(tmp_path / "vcd1.jsonl")
    pope.run(_args(grouped_question_file, out1, use_cd=True))
    out2 = str(tmp_path / "vcd2.jsonl")
    pope.run(_args(grouped_question_file, out2, use_cd=True))
    g1 = {r["question_id"]: r["text"] for r in load_jsonl(out1)}
    g2 = {r["question_id"]: r["text"] for r in load_jsonl(out2)}
    assert g1 == g2 and len(g1) == 6


def test_grad_accumulation_matches_big_batch():
    """accum_steps=2 over two half-batches == one step on the full batch
    (reference base_task accum_grad_iters semantics; optax.MultiSteps mean)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llava_align_tpu.config import LlavaConfig
    from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
    from llava_align_tpu.models import llava
    from llava_align_tpu.train.trainer import (
        build_train_batch, make_optimizer, make_train_step,
    )

    cfg = LlavaConfig.tiny(vocab_size=64)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    rng = np.random.default_rng(0)
    samples = [
        {"input_ids": [1, 5, IMAGE_TOKEN_INDEX, 7 + i, 8, 9],
         "images": rng.normal(size=(3, H, H)).astype(np.float32)}
        for i in range(4)
    ]
    full = build_train_batch(cfg, samples, pad_to=16)
    half1 = build_train_batch(cfg, samples[:2], pad_to=16)
    half2 = build_train_batch(cfg, samples[2:], pad_to=16)

    def leaves(p):
        return jax.tree_util.tree_leaves(p)

    # big batch, 1 step
    opt = make_optimizer(lr=1e-3, warmup_steps=0, total_steps=10, schedule="constant")
    st = opt.init(params)
    step = make_train_step(cfg, opt, attn_impl="xla", donate=False)
    p_big, _, _ = step(params, st, full)

    # two half batches with accumulation
    opt2 = make_optimizer(lr=1e-3, warmup_steps=0, total_steps=10,
                          schedule="constant", accum_steps=2)
    st2 = opt2.init(params)
    step2 = make_train_step(cfg, opt2, attn_impl="xla", donate=False)
    p_acc, st2, _ = step2(params, st2, half1)
    # first micro-step must not change params
    for a, b in zip(leaves(p_acc), leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_acc, st2, _ = step2(p_acc, st2, half2)
    for a, b in zip(leaves(p_acc), leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=2e-5, rtol=1e-4)


def test_resume_with_duplicate_question_ids(tmp_path):
    """MME reuses the image name as question_id for both of its per-image
    questions; resume must key on (id, prompt), not id alone."""
    from llava_align_tpu.runners.common import AnswerFile

    path = str(tmp_path / "a.jsonl")
    ans = AnswerFile(path)
    ans.write({"question_id": "img1.png", "prompt": "Is it red?", "text": "yes"})
    ans.close()

    ans = AnswerFile(path, resume=True)
    assert ans.is_done("img1.png", "Is it red?")
    assert not ans.is_done("img1.png", "Is it blue?")  # 2nd question, same id
    assert ans.is_done("img1.png")  # id-only callers keep old semantics
    ans.write({"question_id": "img1.png", "prompt": "Is it blue?", "text": "no"})
    ans.close()
    import json as _json
    recs = [_json.loads(l) for l in open(path)]
    assert len(recs) == 2
