from .odgt import (
    parse_odgt,
    img_transform,
    segm_transform,
    round2nearest_multiple,
    TrainPipeline,
    ValPipeline,
)
from .cityscapes import Cityscapes, CITYSCAPES_ID_TO_TRAIN_ID, encode_target
from . import transforms
from .prefetch import prefetch_to_device
from .voc import VOCSegmentation
from .loader import batch_iterator, default_collate
