from .metrics import SegMetricMC, dice  # noqa: F401
from .sliding import (patch_grid, sliding_window_inference,  # noqa: F401
                      make_jitted_volume_inferencer)
