"""TPU-native model implementations (flax) with torch-checkpoint converters."""

from biahub_tpu.models.unext2 import UNeXt2
from biahub_tpu.models.convert import torch_state_dict_to_flax

__all__ = ["UNeXt2", "torch_state_dict_to_flax"]
