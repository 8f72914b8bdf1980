"""Logit pipeline parity: fusion math vs hand-computed reference
(vcd_sample.py:188-194) and warpers vs HF transformers implementations."""

import jax.numpy as jnp
import numpy as np
import torch

from llava_align_tpu.decoding.sampler import (
    combine_contrast_branches,
    fuse_contrastive_logits,
    warp_logits,
)


def test_fusion_matches_reference_math():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(50,)).astype(np.float32)
    logits_cd = rng.normal(size=(50,)).astype(np.float32)
    alpha, beta = 1.0, 0.1

    # reference semantics, recomputed in numpy
    cutoff = np.log(beta) + logits.max()
    diffs = (1 + alpha) * logits - alpha * logits_cd
    expected = np.where(logits < cutoff, -np.inf, diffs)

    out = np.asarray(fuse_contrastive_logits(jnp.asarray(logits), jnp.asarray(logits_cd), alpha, beta))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_dual_branch_average():
    b = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    main, contrast = combine_contrast_branches(b, 2)
    np.testing.assert_allclose(np.asarray(main), np.arange(4))
    np.testing.assert_allclose(np.asarray(contrast), (np.arange(4, 8) + np.arange(8, 12)) / 2)


def _hf_warp(logits, temperature=1.0, top_k=None, top_p=None):
    from transformers.generation.logits_process import (
        LogitsProcessorList,
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    warpers = LogitsProcessorList()
    if temperature is not None and temperature != 1.0:
        warpers.append(TemperatureLogitsWarper(temperature))
    if top_k is not None and top_k != 0:
        warpers.append(TopKLogitsWarper(top_k=top_k))
    if top_p is not None and top_p < 1.0:
        warpers.append(TopPLogitsWarper(top_p=top_p))
    t = torch.tensor(logits)[None]
    return warpers(None, t)[0].numpy()


def test_warpers_match_hf():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(64,)).astype(np.float32) * 3
    for kwargs in [
        dict(temperature=0.2),
        dict(temperature=0.7, top_k=10),
        dict(top_p=0.9),
        dict(temperature=0.5, top_k=20, top_p=0.7),
        dict(temperature=1.0),
        dict(top_k=1),
        dict(top_p=0.0),  # keep exactly 1 token
    ]:
        ours = np.asarray(warp_logits(jnp.asarray(logits), **kwargs))
        theirs = _hf_warp(logits, **kwargs)
        ours_inf = np.isinf(ours)
        theirs_inf = np.isinf(theirs)
        np.testing.assert_array_equal(ours_inf, theirs_inf, err_msg=str(kwargs))
        np.testing.assert_allclose(
            ours[~ours_inf], theirs[~theirs_inf], atol=1e-5, err_msg=str(kwargs)
        )


def test_warpers_match_hf_after_fusion_mask():
    """Warpers must behave on already -inf-masked logits (the CD path feeds
    fused+cutoff logits into the warper chain, vcd_sample.py:196-198)."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(32,)).astype(np.float32)
    logits[rng.random(32) < 0.5] = -np.inf
    for kwargs in [dict(temperature=0.3, top_k=5), dict(top_p=0.8)]:
        ours = np.asarray(warp_logits(jnp.asarray(logits), **kwargs))
        theirs = _hf_warp(logits, **kwargs)
        np.testing.assert_array_equal(np.isinf(ours), np.isinf(theirs))
        m = ~np.isinf(ours)
        np.testing.assert_allclose(ours[m], theirs[m], atol=1e-5)


def test_calibrate_fusion_matches_commented_reference_block():
    """fuse_calibrate_logits vs a torch re-enactment of the reference's
    shipped-but-commented use_calibrate block (vcd_sample.py:209-235): the
    cb_cut_weight*max cutoff, the -inf mask, and the cb_m_weight subtraction
    applied only to columns eos+1 and above."""
    import torch

    from llava_align_tpu.decoding.sampler import fuse_calibrate_logits

    rng = np.random.default_rng(0)
    B, V, eos = 3, 64, 2
    cb_cut_weight, cb_m_weight = 0.5, 0.75  # run.sh:8-9 values
    logits = rng.normal(size=(B, V)).astype(np.float32) + 2.0  # max > 0
    custom = rng.normal(size=(B, V)).astype(np.float32)

    t = torch.tensor(logits)
    t_custom = torch.tensor(custom)
    cutoff = cb_cut_weight * t.max(dim=-1, keepdim=True).values
    t = t.masked_fill(t < cutoff, -float("inf"))
    t[:, eos + 1:] = t[:, eos + 1:] - cb_m_weight * t_custom[:, eos + 1:]

    ours = np.asarray(
        fuse_calibrate_logits(
            jnp.asarray(logits), jnp.asarray(custom),
            cb_cut_weight, cb_m_weight, eos,
        )
    )
    theirs = t.numpy()
    np.testing.assert_array_equal(np.isinf(ours), np.isinf(theirs))
    m = ~np.isinf(ours)
    np.testing.assert_allclose(ours[m], theirs[m], rtol=1e-6)
    # special-token columns (<= eos) pass through uncorrected
    assert np.allclose(ours[:, : eos + 1][m[:, : eos + 1]],
                       logits[:, : eos + 1][m[:, : eos + 1]])
