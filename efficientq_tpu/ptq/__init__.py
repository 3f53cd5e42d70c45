from .admm import PTQHyperParams, calibrate_layer  # noqa: F401
from .engine import PTQReport, run_ptq  # noqa: F401
from .fold_bn import fold_bn  # noqa: F401
