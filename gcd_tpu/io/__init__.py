from gcd_tpu.io.convert import (
    flax_path_to_torch_key,
    convert_state_dict_to_params,
    load_torch_state_dict,
)
