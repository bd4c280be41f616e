from .prefix_beam import CtcPrefixBeamSearch, ctc_prefix_beam_search
from .prefix_beam_jax import beam_search_scan, ctc_prefix_beam_search_jax, backtrace
