from vog_tpu.evaluation.grounding_eval import (
    IOU_THRESH,
    evaluate_batch,
    finalize_metrics,
    iou_jnp,
)

__all__ = ["IOU_THRESH", "evaluate_batch", "finalize_metrics", "iou_jnp"]
