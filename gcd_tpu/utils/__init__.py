from gcd_tpu.utils.misc import (
    append_dims,
    append_zero,
    default,
    expand_dims_like,
    count_params,
)
from gcd_tpu.utils.config import (
    instantiate_from_config,
    get_obj_from_str,
    register,
    load_config,
    merge_configs,
    config_to_dict,
)
