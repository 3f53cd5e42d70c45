from .qmatmul import (fused_int8_matmul, fused_qact_matmul,  # noqa: F401
                      qconv1x1_ndhwc)
