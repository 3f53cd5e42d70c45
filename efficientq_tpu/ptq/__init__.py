from .admm import PTQHyperParams, calibrate_layer  # noqa: F401
from .engine import (PTQReport, block_calibration_targets,  # noqa: F401
                     run_ptq, run_ptq_mixed)
from .fold_bn import fold_bn  # noqa: F401
from .select import select_calibration  # noqa: F401
