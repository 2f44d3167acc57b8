from .logging import setup_logger
from .observability import MetricsWriter, profile_trace, annotate
from .colors import color_encode, STREETHAZARDS_COLORS, CITYSCAPES_TRAIN_COLORS
from .visualize import Denormalize, save_result_grid
