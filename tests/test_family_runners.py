"""Offline end-to-end smokes for the qwen and blip runners (tiny random
models, mock tokenizers, synthetic images) — regression protection for the
full CLI paths."""

import json
import os

import pytest


@pytest.fixture()
def questions(tmp_path):
    qf = tmp_path / "q.json"
    with open(qf, "w") as f:
        for i in range(2):
            f.write(
                json.dumps(
                    {"question_id": i, "image": f"i{i}.jpg",
                     "text": f"Is there a cat #{i}?", "label": "no"}
                ) + "\n"
            )
    return str(qf)


def test_qwen_runner_end_to_end(questions, tmp_path):
    from llava_align_tpu.runners import qwen_pope

    out = str(tmp_path / "ans.jsonl")
    args = qwen_pope.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", questions,
         "--answers-file", out, "--use_dd_unk", "--calibrate"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 3
    qwen_pope.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    assert {"naive", "none", "unk", "text"} <= set(recs[0])


def test_blip_runner_end_to_end(questions, tmp_path):
    from llava_align_tpu.runners import blip_pope

    out = str(tmp_path / "ans.jsonl")
    args = blip_pope.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", questions,
         "--answers-file", out, "--use_cd", "--calibrate"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 3
    blip_pope.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    assert {"naive", "none", "noise", "text"} <= set(recs[0])


def test_mme_qwen_runner_end_to_end(tmp_path):
    """--model-family qwen = reference MME/run_qwen.py: qwen prompts over the
    MME question file, then the same convert+score pipeline."""
    from llava_align_tpu.runners import mme

    q_texts = ["Is there a dog in the image? Please answer yes or no.",
               "Is there a cat in the image? Please answer yes or no."]
    qf = tmp_path / "mme.jsonl"
    with open(qf, "w") as f:
        for i, q in enumerate(q_texts):
            f.write(json.dumps({
                "question_id": f"existence/i0.png",
                "image": "i0.jpg", "text": q, "label": "no",
            }) + "\n")
    root = tmp_path / "MME_Benchmark" / "existence"
    os.makedirs(root)
    with open(root / "i0.txt", "w") as f:
        for q in q_texts:
            f.write(f"{q}\tyes\n")

    out = str(tmp_path / "ans.jsonl")
    args = mme.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", str(qf),
         "--answers-file", out, "--model-family", "qwen",
         "--mme-data-root", str(tmp_path / "MME_Benchmark"), "--use_dd_unk"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 3
    report = mme.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2 and {"naive", "text"} <= set(recs[0])
    assert "existence" in report["Perception"]["tasks"]


def test_bias_probe_runner(questions, tmp_path):
    from llava_align_tpu.runners import bias_probe

    out = str(tmp_path / "probe.jsonl")
    args = bias_probe.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", questions,
         "--answers-file", out]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    bias_probe.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    assert {"none", "unk", "noise", "zero", "one", "naive"} <= set(recs[0])


def test_mmmu_runner_and_scoring(tmp_path):
    from llava_align_tpu.runners import mmmu

    qf = tmp_path / "mmmu.jsonl"
    with open(qf, "w") as f:
        for i in range(2):
            f.write(
                json.dumps(
                    {"id": f"val_art_{i}", "subject": "art",
                     "question_type": "multiple-choice", "answer": "B",
                     "all_choices": ["A", "B", "C", "D"],
                     "index2ans": {"A": "w", "B": "x", "C": "y", "D": "z"},
                     "final_input_prompt": f"Pick one (A) w (B) x (C) y (D) z #{i}",
                     "image": f"m{i}.jpg"}
                ) + "\n"
            )
    out = str(tmp_path / "ans.jsonl")
    args = mmmu.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", str(qf),
         "--answers-file", out, "--calibrate"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 3
    mmmu.run(args)
    for setting in ("naive", "none_unk"):
        rep = mmmu.score(out, setting)
        assert "art" in rep["subjects"]
        assert 0.0 <= rep["overall_acc"] <= 1.0


def test_mmmu_calibrate_best_runner(tmp_path):
    """--calibrate-best dumps all 5 content-free probes and score_sweep
    evaluates the 9-setting sweep with a best pick + table (reference
    run_llava_calibrate_best.py + print_results.py)."""
    from llava_align_tpu.evals.mmmu import SWEEP_SETTINGS
    from llava_align_tpu.runners import mmmu

    qf = tmp_path / "mmmu.jsonl"
    with open(qf, "w") as f:
        for i in range(2):
            f.write(
                json.dumps(
                    {"id": f"validation_Art_{i}", "subject": "Art",
                     "question_type": "multiple-choice", "answer": "B",
                     "all_choices": ["A", "B"],
                     "index2ans": {"A": "w", "B": "x"},
                     "final_input_prompt": f"Pick one (A) w (B) x #{i}",
                     "image": f"m{i}.jpg"}
                ) + "\n"
            )
    out = str(tmp_path / "ans.jsonl")
    args = mmmu.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", str(qf),
         "--answers-file", out, "--calibrate-best"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 3
    mmmu.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert {"naive", "none", "unk", "noise", "zero", "one"} <= set(recs[0])
    res = mmmu.score_sweep(out)
    assert set(res["settings"]) == set(SWEEP_SETTINGS)
    assert res["best_setting"] in SWEEP_SETTINGS
    assert "Overall-Art and Design" in res["table"]


def test_mmmu_qwen_runner(tmp_path):
    """--model-family qwen = reference MMMU run_qwen_sampling.py: qwen engine
    over MMMU samples with the '<image 1>'-stripped ' Answer:' prompt; the
    shared scorer applies unchanged."""
    from llava_align_tpu.runners import mmmu

    qf = tmp_path / "mmmu.jsonl"
    with open(qf, "w") as f:
        for i in range(2):
            f.write(
                json.dumps(
                    {"id": f"val_art_{i}", "subject": "art",
                     "question_type": "multiple-choice", "answer": "B",
                     "all_choices": ["A", "B"],
                     "index2ans": {"A": "w", "B": "x"},
                     "final_input_prompt": f"<image 1> Pick one (A) w (B) x #{i}",
                     "image": f"m{i}.jpg"}
                ) + "\n"
            )
    out = str(tmp_path / "ans.jsonl")
    args = mmmu.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", str(qf),
         "--answers-file", out, "--model-family", "qwen", "--calibrate"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 3
    mmmu.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2 and {"naive", "none", "unk", "text"} <= set(recs[0])
    rep = mmmu.score(out, "none_unk")
    assert "art" in rep["subjects"]


def test_mmmu_qwen_dd_both(tmp_path):
    """Regression: qwen MMMU with --use_dd --use_dd_unk must wire the
    retokenized 'None {q} Answer:' unk branch ids into the engine call
    (the scripts/mmmu/mmmu.sh dd_both leg crashed without them)."""
    from llava_align_tpu.runners import mmmu

    qf = tmp_path / "mmmu.jsonl"
    with open(qf, "w") as f:
        f.write(json.dumps(
            {"id": "val_art_0", "subject": "art",
             "question_type": "multiple-choice", "answer": "B",
             "all_choices": ["A", "B"], "index2ans": {"A": "w", "B": "x"},
             "final_input_prompt": "<image 1> Pick one (A) w (B) x",
             "image": "m0.jpg"}) + "\n")
    out = str(tmp_path / "ans.jsonl")
    args = mmmu.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", str(qf),
         "--answers-file", out, "--model-family", "qwen",
         "--use_dd", "--use_dd_unk"]
    )
    args.synthetic_images = True
    args.temperature = 0.0
    args.max_new_tokens = 2
    mmmu.run(args)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 1 and recs[0]["text"] is not None


def test_sampling_sweep_mmmu(tmp_path, monkeypatch):
    """--benchmark mmmu routes the decoding-config grid through the MMMU
    runner with 'setting'-templated answer files (run_llava_sampling.py)."""
    from llava_align_tpu.runners import sampling

    qf = tmp_path / "mmmu.jsonl"
    with open(qf, "w") as f:
        f.write(json.dumps(
            {"id": "val_art_0", "subject": "art",
             "question_type": "multiple-choice", "answer": "B",
             "all_choices": ["A", "B"], "index2ans": {"A": "w", "B": "x"},
             "final_input_prompt": "Pick one (A) w (B) x",
             "image": "m0.jpg"}) + "\n")
    out = str(tmp_path / "ans_setting.jsonl")
    args = sampling.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", str(qf),
         "--answers-file", out, "--benchmark", "mmmu"]
    )
    args.synthetic_images = True
    args.max_new_tokens = 2

    # full-grid shape is pinned below; the live smoke trims the grids so the
    # engine compiles only a few settings
    assert len(sampling.TEMPERATURE_GRID) == 20
    assert sampling.TEMPERATURE_GRID[0] == 0.05 and sampling.TEMPERATURE_GRID[-1] == 1.0
    assert len(sampling.TOP_P_GRID) == 21
    assert sampling.TOP_K_GRID == [1, 2, 5, 10, 20, 50, 100, 200, 500]
    monkeypatch.setattr(sampling, "TEMPERATURE_GRID", [0.5])
    monkeypatch.setattr(sampling, "TOP_P_GRID", [0.5])
    monkeypatch.setattr(sampling, "TOP_K_GRID", [1])
    produced = sampling.run_sweep(args)
    names = {os.path.basename(p) for p in produced}
    assert "ans_default.jsonl" in names and "ans_top_k_1.jsonl" in names
    recs = [json.loads(l) for l in open(tmp_path / "ans_default.jsonl")]
    assert recs and "naive" in recs[0]


def test_mmmu_score_sweep_files(tmp_path):
    """Per-setting sweep-file aggregation (reference
    MMMU/samlping/main_eval_only.py main loop): evaluate every
    {prefix}{setting}.jsonl and tabulate accs."""
    from llava_align_tpu.runners import mmmu

    rec = {"question_id": "val_art_0", "subject": "art",
           "question_type": "multiple-choice", "answer": "B",
           "all_choices": ["A", "B"], "index2ans": {"A": "w", "B": "x"}}
    for setting, text in (("default", "B"), ("top_k_1", "A")):
        with open(tmp_path / f"ans_{setting}.jsonl", "w") as f:
            f.write(json.dumps(dict(rec, text=text)) + "\n")
    csv = tmp_path / "sweep.csv"
    res = mmmu.score_sweep_files(str(tmp_path), "ans_", csv_path=str(csv))
    assert set(res) == {"default", "top_k_1"}
    assert res["default"]["overall_acc"] == 1.0
    assert res["top_k_1"]["overall_acc"] == 0.0
    body = csv.read_text()
    assert "default,Overall,1.0000" in body and "top_k_1,Overall,0.0000" in body


def test_caption_runner_end_to_end(questions, tmp_path):
    """Beam-search captioning through CaptionTask (reference LAVIS caption
    flow with blip2 generate num_beams default)."""
    from llava_align_tpu.runners import caption

    rdir = str(tmp_path / "cap")
    args = caption.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", questions,
         "--result-dir", rdir, "--num-beams", "2", "--max-len", "4",
         "--min-len", "1", "--synthetic-images"]
    )
    caption.run(args)
    saved = json.load(open(os.path.join(rdir, "val_epoch0.json")))
    assert len(saved) == 2
    assert {"caption", "image_id"} <= set(saved[0])
