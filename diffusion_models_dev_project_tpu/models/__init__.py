from .unet import UNetModel, UNetConfig, build_arch_spec, create_model_config, timestep_embedding
from .torch_convert import (convert_torch_state_dict, convert_ema_state,
                            load_torch_checkpoint, torch_key_map)
