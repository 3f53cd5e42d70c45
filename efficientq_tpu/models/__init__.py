from .uresq import UResQConfig, build_uresq, num_mo, preset_config  # noqa: F401
from . import torch_io  # noqa: F401
