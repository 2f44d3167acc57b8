from .config import Config, load_config, default_config
from .dtypes import Policy
