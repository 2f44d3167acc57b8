"""open-world-semantic-segmentation_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework
for open-world semantic segmentation.

Re-implements the full capability surface of the DMLNet reference
(Jun-CEN/Open-World-Semantic-Segmentation, ICCV 2021) with a TPU-first design:

- ``models``   : Flax backbones (CSAIL-stem + torchvision-stem ResNet, MobileNetV2,
                 HRNetV2, ResNeXt) and decoders (C1/PPM/UPerNet/ASPP/DeepLabV3+),
                 including the DML pixel-embedding distance heads.
- ``ops``      : numeric kernels — torch-parity bilinear resize, adaptive avg-pool,
                 fused distance-to-prototype head (Pallas), anomaly-score maps.
- ``parallel`` : SPMD mesh / sharding helpers; cross-replica BN via ``lax.pmean``
                 replaces the reference's thread-based SyncBN.
- ``data``     : odgt (StreetHazards/BDD/LostAndFound) and Cityscapes open-world
                 pipelines, joint transforms, host-side prefetch.
- ``openset``  : MSP / maxlogit / dissum / background / KNN-cosine / reconstruction
                 anomaly scoring.
- ``fewshot``  : prototype extraction + NPM, multi-head self-distillation (FT/PLM),
                 teacher-student distillation.
- ``train``    : jitted train steps, optax SGD+momentum+poly schedules with
                 torch-compatible parameter grouping, checkpointing, .pth converter.
- ``metrics``  : AUROC/AUPR/FPR@95 (bit-parity port of anom_utils), streaming
                 confusion-matrix mIoU (StreamSegMetrics semantics), IoU histograms.

Import alias convention: ``import open_world_semantic_segmentation_tpu as owss``.
"""

__version__ = "0.1.0"

from . import core  # noqa: E402,F401
from . import data  # noqa: E402,F401
from . import fewshot  # noqa: E402,F401
from . import metrics  # noqa: E402,F401
from . import models  # noqa: E402,F401
from . import openset  # noqa: E402,F401
from . import ops  # noqa: E402,F401
from . import parallel  # noqa: E402,F401
from . import train  # noqa: E402,F401
from . import utils  # noqa: E402,F401
