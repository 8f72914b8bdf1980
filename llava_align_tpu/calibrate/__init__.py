from llava_align_tpu.calibrate.posthoc import (  # noqa: F401
    LABEL_DICT,
    LABEL_TO_INT,
    calibrate_label_dict,
    calibrate_weight,
    ece,
    eval_accuracy,
    get_prob_from_logits,
)
