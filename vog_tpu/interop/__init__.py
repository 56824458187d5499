from vog_tpu.interop.torch_twin import TorchVOGNet, flax_params_to_torch

__all__ = ["TorchVOGNet", "flax_params_to_torch"]
