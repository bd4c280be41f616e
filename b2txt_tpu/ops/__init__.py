from .smoothing import gauss_smooth, gaussian_kernel, kernel_array
from .augment import TransformArgs, transform_data
from .ctc import (
    ctc_loss,
    ctc_loss_from_logits,
    greedy_decode_ids,
    batched_greedy_collapse,
)
