from .scoring import (
    normalize_01,
    coefficient_map,
    msp_conf,
    maxlogit_conf,
    dissum_conf,
    background_conf,
    knn_cosine_conf,
    rec_cosine_conf,
    rec_cosine_map,
    compute_conf,
    SCORING_METHODS,
)
from .calibration import (
    ScoreCalibration,
    collect_dissum_samples,
    fit_gmm2_1d,
    ecdf_eval,
    certainty,
)
from .crf import bilateral_crf_conf, gaussian_crf_conf
from .evaluator import OODEvaluator, multi_scale_forward
from .fishyscapes import make_estimator, run_bdlb
