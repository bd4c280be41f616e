from .prefix_beam import CtcPrefixBeamSearch, ctc_prefix_beam_search
from .prefix_beam_jax import beam_search_scan, ctc_prefix_beam_search_jax, backtrace
from .lmbeam import DecodeResult, LexiconBeamSearch, decode_numpy
from .jax_lm import JaxCausalLMRescorer
from .rescore import (
    NGramLLMAdapter,
    TorchCausalLMRescorer,
    augment_nbest,
    get_string_differences,
    llm_rescore,
    llm_rescore_async,
    rescore_nbest_with_ngram,
)


def device_lexicon_beam_search(*args, **kwargs):
    """Lazy constructor for the TPU-resident searcher (imports jax device code)."""
    from .lmbeam_jax import DeviceLexiconBeamSearch

    return DeviceLexiconBeamSearch(*args, **kwargs)
