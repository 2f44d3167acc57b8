from .prototypes import (
    extract_prototype,
    average_prototypes,
    load_prototypes,
    save_prototypes,
    npm_override,
    npm_label_remap,
)
from .self_distillation import (
    merge_head_predictions,
    pseudo_label,
    self_distillation_eval_remap,
)
