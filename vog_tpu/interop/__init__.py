from vog_tpu.interop.torch_twin import (
    TorchVOGNet,
    detect_variant,
    flax_params_to_torch,
)

__all__ = ["TorchVOGNet", "detect_variant", "flax_params_to_torch"]
