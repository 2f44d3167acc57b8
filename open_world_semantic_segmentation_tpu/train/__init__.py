from .losses import (
    cross_entropy,
    pixel_acc,
    dml_segmentation_loss,
    deeplab_cross_entropy,
    focal_loss,
    distillation_loss,
)
from .optim import (
    poly_schedule,
    torch_sgd,
    decay_mask,
    two_group_optimizer,
    backbone_classifier_optimizer,
)
from .state import TrainState, make_anomaly_train_step, make_deeplab_train_step
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_checkpoint_lenient,
    save_checkpoint_orbax,
    load_checkpoint_orbax,
)
from . import convert

