"""Post-Hoc calibration algebra + ECE parity (reference utils/metrics.py)."""

import numpy as np
import torch
import torch.nn.functional as F

from llava_align_tpu.calibrate.posthoc import (
    apply_calibration,
    calibrate_label_dict,
    calibrate_weight,
    ece,
    eval_accuracy,
    get_prob_from_logits,
)


def test_diagonal_w_algebra():
    W, b = calibrate_weight([0.8, 0.2], "diagonal_W")
    np.testing.assert_allclose(W, np.diag([1 / 0.8, 1 / 0.2]))
    np.testing.assert_allclose(b, np.zeros((2, 1)))
    # a sample matching the content-free prior exactly becomes uniform
    out = apply_calibration([0.8, 0.2], W, b)
    np.testing.assert_allclose(out.ravel(), [0.5, 0.5])


def test_identity_w_algebra():
    W, b = calibrate_weight([0.6, 0.4], "identity_W")
    np.testing.assert_allclose(W, np.eye(2))
    np.testing.assert_allclose(b.ravel(), [-0.6, -0.4])


def test_eval_accuracy_uncalibrated_vs_calibrated():
    # model biased towards class 0 on everything
    probs = np.array([[0.7, 0.3], [0.6, 0.4], [0.55, 0.45], [0.9, 0.1]])
    labels = [0, 1, 1, 0]
    acc_raw, _ = eval_accuracy(probs, labels)
    assert acc_raw == 0.5
    # content-free prior shows the bias; calibration fixes rows 2-3
    acc_cal, _ = eval_accuracy(probs, labels, mode="diagonal_W", p_cf=[0.65, 0.35])
    assert acc_cal == 1.0


def _torch_ece(probs, labels, n_bins):
    """Direct transcription of reference ECELoss.forward as oracle."""
    logits = torch.tensor(np.asarray(probs), dtype=torch.float32).squeeze()
    labels_t = torch.tensor(np.asarray(labels))
    softmaxes = F.softmax(logits, dim=-1)
    confidences, predictions = torch.max(softmaxes, -1)
    accuracies = predictions.eq(labels_t)
    bounds = torch.linspace(0, 1, n_bins + 1)
    total = torch.zeros(1)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        in_bin = confidences.gt(lo.item()) * confidences.le(hi.item())
        prop = in_bin.float().mean()
        if prop.item() > 0:
            acc = accuracies[in_bin].float().mean()
            conf = confidences[in_bin].mean()
            total += torch.abs(conf - acc) * prop
    return float(total)


def test_ece_matches_torch_reference():
    rng = np.random.default_rng(0)
    probs = rng.dirichlet([1, 1], size=200)
    labels = rng.integers(0, 2, 200)
    for bins in (10, 15):
        assert abs(ece(probs, labels, bins) - _torch_ece(probs, labels, bins)) < 1e-6


class MockTok:
    def decode(self, token_id):
        return {3: " Yes", 4: "No ", 5: "dog", 6: "YES"}.get(token_id, f"t{token_id}")


def test_calibrate_label_dict_first_occurrence_wins():
    d = calibrate_label_dict([0.5, 0.3, 0.1, 0.05], [3, 4, 6, 5], MockTok(), top_k=10)
    # ' Yes' and 'YES' both normalize to 'yes'; first (higher prob) kept
    assert d == {"yes": 0.5, "no": 0.3, "dog": 0.05}


def test_get_prob_from_logits():
    p = get_prob_from_logits({"Yes": 0.6, "no": 0.25, "cat": 0.1})
    assert p == [0.6, 0.25]
    p2 = get_prob_from_logits({"maybe": 1.0})
    assert p2 == [0.0, 0.0]
