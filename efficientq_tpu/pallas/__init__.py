from .qmatmul import fused_qact_matmul, qconv1x1_ndhwc  # noqa: F401
