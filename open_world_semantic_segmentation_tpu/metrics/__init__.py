from .anom import (
    stable_cumsum,
    fpr_and_fdr_at_recall,
    binary_auroc,
    binary_aupr,
    get_measures,
    get_and_print_results,
    eval_ood_measure,
    print_measures,
)
from .segmentation import (
    pixel_accuracy,
    intersection_and_union,
    intersection_and_union_jax,
    StreamSegMetrics,
    confusion_matrix_update,
)
from .meters import AverageMeter, StepTimer
