from .config import (
    DataTransforms,
    DatasetConfig,
    DecodeConfig,
    InputNetworkConfig,
    ModelConfig,
    TrainConfig,
    load_args_yaml,
)
from .phonemes import (
    LOGIT_TO_PHONEME,
    LOGIT_PHONE_DEF,
    SIL_DEF,
    rearrange_speech_logits,
    logits_to_phonemes,
    remove_punctuation,
)
from .metrics import (
    edit_distance,
    calculate_error_rate,
    calculate_aggregate_error_rate,
)
from .logging import make_logger
