from .gru_decoder import (
    GRUDecoder,
    Params,
    extract_patches,
    forward,
    init_params,
    init_params_from_config,
    param_count,
)
from .torch_import import (
    load_torch_checkpoint,
    params_from_state_dict,
    state_dict_from_params,
)
