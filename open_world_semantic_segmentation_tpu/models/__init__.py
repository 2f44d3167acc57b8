from .layers import ConvBN, BNConfig
from .resnet import (ResNet, resnet18, resnet34, resnet50, resnet101,
                     resnet_deeplab)
from .decoders import C1, C1DeepSup, PPM, PPMDeepsup, PPMDeepsupEmbedding, UPerNet
from .deeplab import (
    ASPP,
    DeepLabHeadV3Plus,
    DeepLabHead,
    DeepLabV3Plus,
    DeepLabV3PlusEmbedding,
    DeepLabV3PlusSelfDistillation,
    deeplabv3plus_resnet101,
    deeplabv3plus_resnet50,
    deeplabv3_resnet101,
    deeplabv3plus_embedding_resnet101,
    deeplabv3plus_embedding_resnet50,
    deeplabv3plus_embedding_mobilenet,
    deeplabv3plus_embedding_self_distillation_resnet101,
    deeplabv3plus_mobilenet,
    deeplabv3_mobilenet,
)
from .builder import ModelBuilder, SegmentationModel
from .mobilenet import MobileNetV2, mobilenet_v2
from .hrnet import HRNetV2, hrnetv2
from .resnext import resnext101
