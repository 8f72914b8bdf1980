"""Dataset-builder tail: AVSD dialogue, imagefolder, blip-diffusion
fine-tune datasets + builders, exercised offline from synthetic annotations
and consumed by the matching tasks (the VERDICT r4 'done' criterion)."""

import json
import os

import numpy as np
import pytest

from llava_align_tpu.framework import datasets as ds
from llava_align_tpu.framework.processors import (
    BlipCaptionProcessor, GPTDialogueProcessor, GPTVideoFeatureProcessor,
)
from llava_align_tpu.framework.registry import registry
from llava_align_tpu.framework.tasks import DialogueTask

from test_processors_tail import MockGPT2Tokenizer


def test_tail_builders_registered():
    for name in ("avsd_dialogue", "imagenet", "blip_diffusion_finetune"):
        assert registry.get_builder_class(name) is not None, name


AVSD_ANN = {
    "dialogs": [
        {
            "image_id": "vid1",
            "caption": "a man cooks",
            "summary": "cooking",
            "dialog": [
                {"question": "who is there", "answer": "a man"},
                {"question": "where is he", "answer": "kitchen"},
                {"question": "what does he do", "answer": "he cooks"},
            ],
        },
        {
            "image_id": "vid2",
            "caption": "a dog runs",
            "summary": "running",
            "dialog": [
                {"question": "what animal", "answer": "a dog"},
                {"question": "is it fast", "answer": "yes"},
            ],
        },
    ]
}


@pytest.fixture()
def avsd_root(tmp_path):
    ann_path = tmp_path / "avsd.json"
    ann_path.write_text(json.dumps(AVSD_ANN))
    rng = np.random.default_rng(0)
    for ft in ("i3d_rgb", "vggish"):
        os.makedirs(tmp_path / ft)
        for vid, t in (("vid1", 6), ("vid2", 4)):
            np.save(tmp_path / ft / f"{vid}.npy",
                    rng.normal(size=(t, 3)).astype(np.float32))
    return tmp_path, str(ann_path)


def _avsd_processors():
    tok = MockGPT2Tokenizer()
    return (
        GPTVideoFeatureProcessor(visual_ft=["i3d_rgb"], audio_ft=["vggish"],
                                 tokenizer=tok),
        GPTDialogueProcessor(max_turns=3, tokenizer=tok),
        tok,
    )


def test_avsd_train_expansion_and_eval_last_turn(avsd_root):
    root, ann_path = avsd_root
    vis, txt, _ = _avsd_processors()
    train = ds.AVSDDialDataset(vis, txt, str(root), [ann_path])
    # per-turn expansion (reference dialogue_datasets.py:44-57): 3 + 2 turns
    assert len(train) == 5
    # turn 2 of dialog 0 has exactly 1 turn of context
    assert len(train.annotation[1]["dialog"]) == 1
    assert train.annotation[1]["question"] == "where is he"

    ev = ds.AVSDDialEvalDataset(vis, txt, str(root), [ann_path])
    assert len(ev) == 2
    assert ev.annotation[0]["question"] == "what does he do"
    assert len(ev.annotation[0]["dialog"]) == 2


def test_avsd_getitem_and_collater(avsd_root):
    root, ann_path = avsd_root
    vis, txt, tok = _avsd_processors()
    dset = ds.AVSDDialDataset(vis, txt, str(root), [ann_path])
    s0, s1 = dset[0], dset[4]  # vid1 (T=6) and vid2 (T=4)
    assert s0["video_fts"].shape == (6, 6)  # min(6,6) frames × (3+3) feats
    assert s1["video_fts"].shape == (4, 6)

    batch = dset.collater([s0, s1])
    B, TV = 2, 6  # padded video length
    L = batch["input_ids"].shape[1]
    assert batch["video_fts"].shape == (B, TV, 6)
    # reference avsd_dialogue_datasets.py:63-83: video segment prepended
    assert batch["token_type_ids"].shape == (B, TV + L)
    assert batch["labels"].shape == (B, TV + L)
    assert batch["attn_mask"].shape == (B, TV + L)
    # video labels all ignored
    assert (batch["labels"][:, :TV] == -1).all()
    # answer tokens supervised somewhere in the text segment
    assert (batch["labels"][:, TV:] != -1).any()
    # vid2 padding frames masked off
    assert batch["attn_mask"][1, 4:TV].sum() == 0
    video_type = tok.convert_tokens_to_ids("<video>")
    assert (batch["token_type_ids"][0, :TV] == video_type).all()


def test_avsd_through_builder_and_dialogue_task(avsd_root):
    root, ann_path = avsd_root
    vis, txt, _ = _avsd_processors()
    builder_cls = registry.get_builder_class("avsd_dialogue")
    builder = builder_cls(
        build_info={"train": {"ann_paths": [ann_path], "vis_root": str(root)},
                    "val": {"ann_paths": [ann_path], "vis_root": str(root)}},
        vis_processors={"train": vis, "eval": vis},
        text_processors={"train": txt, "eval": txt},
    )
    splits = builder.build()
    assert isinstance(splits["train"], ds.AVSDDialDataset)
    assert isinstance(splits["val"], ds.AVSDDialEvalDataset)
    assert not isinstance(splits["train"], ds.AVSDDialEvalDataset)

    # DialogueTask consumes collated batches through its loss_fn
    # (reference dialogue.py:51-55 — valid loss per sample)
    dset = splits["val"]
    loader = [dset.collater([dset[i]]) for i in range(len(dset))]
    task = DialogueTask(
        loss_fn=lambda p, b: float((b["labels"] != -1).sum())
    )
    metrics = task.after_evaluation(task.evaluation(None, loader))
    assert metrics["n"] == 2 and metrics["agg_metrics"] > 0


def _write_png(path, color):
    from PIL import Image

    Image.fromarray(np.full((16, 16, 3), color, np.uint8)).save(path)


def test_imagefolder_dataset_and_builder(tmp_path):
    for split in ("train", "val"):
        for cls_name, color in (("cat", 10), ("dog", 200)):
            d = tmp_path / split / cls_name
            os.makedirs(d)
            _write_png(d / "a.png", color)
            _write_png(d / "b.png", color + 5)

    dset = ds.ImageFolderDataset(
        vis_processor=lambda img: np.asarray(img, np.float32),
        vis_root=str(tmp_path / "train"),
    )
    assert len(dset) == 4
    assert dset.classes == ["cat", "dog"]
    s = dset[0]
    assert s["label"] == 0 and s["image"].shape == (16, 16, 3)
    assert dset[3]["label"] == 1
    item = dset.displ_item(2)
    assert item["label"] == "dog"

    builder_cls = registry.get_builder_class("imagenet")
    builder = builder_cls(
        build_info={"train": {"vis_root": str(tmp_path)},
                    "val": {"vis_root": str(tmp_path)}},
        vis_processors={"train": lambda x: np.asarray(x, np.float32),
                        "eval": lambda x: np.asarray(x, np.float32)},
        classnames=["kitty", "doggo"],
    )
    splits = builder.build()
    assert len(splits["train"]) == 4 and len(splits["val"]) == 4
    assert splits["val"].displ_item(0)["label"] == "kitty"
    with pytest.raises(AssertionError):
        builder_cls(build_info={"test": {"vis_root": str(tmp_path)}}).build()


def test_subject_driven_t2i_dataset_and_builder(tmp_path):
    img_dir = tmp_path / "subj"
    os.makedirs(img_dir)
    _write_png(img_dir / "x.png", 30)
    _write_png(img_dir / "y.jpg", 90)
    (img_dir / "notes.txt").write_text("skip me")

    inp = registry.get_processor_class("blip_diffusion_inp_image_train")(image_size=16)
    tgt = registry.get_processor_class("blip_diffusion_tgt_image_train")(image_size=16)
    txt = BlipCaptionProcessor()

    dset = ds.SubjectDrivenTextToImageDataset(
        image_dir=str(img_dir), subject_text="Toy Robot",
        inp_image_processor=inp, tgt_image_processor=tgt, txt_processor=txt,
        repetition=3,
    )
    assert len(dset) == 6 and dset.len_without_repeat == 2
    s = dset[4]  # wraps around modulo 2 (reference :59)
    assert s["caption"] == "a toy robot"
    assert s["inp_image"].shape == (3, 16, 16)
    assert s["tgt_image"].shape == (3, 16, 16)
    assert s["tgt_image"].min() >= -1.0 and s["tgt_image"].max() <= 1.0
    batch = dset.collater([dset[0], dset[1]])
    assert batch["inp_image"].shape == (2, 3, 16, 16)

    builder_cls = registry.get_builder_class("blip_diffusion_finetune")
    splits = builder_cls(
        build_info={"images": {"storage": str(img_dir)},
                    "subject_text": "sculpture"},
        vis_processors={"inp": inp, "tgt": tgt},
        text_processors={"eval": txt},
        repetition=2,
    ).build()
    assert set(splits) == {"train"}
    assert len(splits["train"]) == 4
    assert splits["train"][0]["subject_text"] == "sculpture"


# ---------------------------------------------------------------------------
# named builder registrations (round 5): every reference builder name
# ---------------------------------------------------------------------------

REFERENCE_BUILDERS = """aok_vqa avsd_dialogue blip_diffusion_finetune
coco_caption coco_retrieval coco_vqa conceptual_caption_12m
conceptual_caption_3m didemo_retrieval flickr30k gqa imagenet laion2B_multi
msrvtt_caption msrvtt_qa msrvtt_retrieval msvd_caption msvd_qa nlvr nocaps
ok_vqa sbu_caption snli_ve vatex_caption vg_caption vg_vqa""".split()


def test_every_reference_builder_name_registered():
    mine = set(registry.list("builder"))
    missing = sorted(set(REFERENCE_BUILDERS) - mine)
    assert not missing, f"unregistered reference builder names: {missing}"


def test_named_caption_builder_builds(tmp_path):
    ann = [
        {"image": "a.jpg", "caption": "a dog", "image_id": "i0"},
        {"image": "b.jpg", "caption": "a cat", "image_id": "i1"},
    ]
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(ann))
    b = registry.get_builder_class("coco_caption")(
        {"train": {"ann_paths": [str(p)], "vis_root": str(tmp_path)}},
        synthetic_images=True,
    )
    split = b.build()["train"]
    assert b.dataset_name == "coco" and len(b.download_entries()) > 0
    sample = split[0]
    assert sample["text_input"] == "a dog" and sample["image_id"] == 0


def test_named_video_builders_build(tmp_path):
    vid = tmp_path / "v0.npy"
    np.save(vid, np.zeros((2, 8, 8, 3), np.uint8))
    cap_ann = [{"video": "v0.npy", "caption": "clip", "image_id": "v0"}]
    qa_ann = [{"video": "v0.npy", "question": "what?", "answer": "cat"}]
    capf = tmp_path / "vc.json"
    capf.write_text(json.dumps(cap_ann))
    qaf = tmp_path / "vq.json"
    qaf.write_text(json.dumps(qa_ann))

    b = registry.get_builder_class("msrvtt_caption")(
        {"train": {"ann_paths": [str(capf)], "vis_root": str(tmp_path)}},
    )
    s = b.build()["train"][0]
    assert s["image_id"] == 0 and s["text_input"] == "clip"

    b = registry.get_builder_class("msvd_qa")(
        {"val": {"ann_paths": [str(qaf)], "vis_root": str(tmp_path)}},
        answer_list=["dog", "cat"],
    )
    s = b.build()["val"][0]
    assert s["answers"] == 1
    assert b.dataset_name == "msvd"


def test_snli_ve_builder_builds(tmp_path):
    ann = [{"image": "x.jpg", "sentence": "a claim", "label": "entailment"}]
    p = tmp_path / "snli.json"
    p.write_text(json.dumps(ann))
    b = registry.get_builder_class("snli_ve")(
        {"val": {"ann_paths": [str(p)], "vis_root": str(tmp_path)}},
        synthetic_images=True,
        classnames=["contradiction", "neutral", "entailment"],
    )
    s = b.build()["val"][0]
    assert s["label"] == 2
