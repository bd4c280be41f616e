from .gru import gru_layer_pallas
from .preprocess import fused_preprocess
