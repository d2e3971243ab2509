"""Evaluation metrics: on-device confusion-matrix accumulation and the
reference's confusion-derived scores (mIoU / precision / recall / Dice / OA,
`utils.py:301-403`), plus the confusion-heatmap and class-prior plots."""

from cvcs_tpu.metrics.confusion import (  # noqa: F401
    confusion_matrix,
    update_confusion,
    normalize_rows,
)
from cvcs_tpu.metrics.scores import (  # noqa: F401
    iou,
    precision,
    recall,
    f1,
    accuracy,
    print_metrics,
    compute_metrics,
)
