from vog_tpu.evaluation.grounding_eval import (
    IOU_THRESH,
    evaluate_batch,
    finalize_metrics,
    iou_jnp,
)
from vog_tpu.evaluation.offline import eval_fun

__all__ = [
    "IOU_THRESH",
    "eval_fun",
    "evaluate_batch",
    "finalize_metrics",
    "iou_jnp",
]
