"""Image retrieval by mask similarity and deep features — the capability of
the reference's `retrieval.ipynb` (SURVEY §2.6), as a library instead of a
notebook."""

from cvcs_tpu.retrieval.scores import (  # noqa: F401
    class_hist,
    compute_scores,
    get_best_match_idx,
    per_image_emd,
    per_image_miou,
    per_image_wiou,
    pixel_precision,
    scores_evaluation,
)
from cvcs_tpu.retrieval.features import (  # noqa: F401
    extract_embedding,
    rank_by_distance,
)
