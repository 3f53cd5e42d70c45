from .admm import PTQHyperParams, calibrate_layer  # noqa: F401
from .engine import (PTQReport, apply_qlvl_overrides,  # noqa: F401
                     block_calibration_targets, run_ptq, run_ptq_mixed,
                     tail_sensitive_convs)
from .fold_bn import fold_bn  # noqa: F401
from .select import select_calibration  # noqa: F401
