from .figures import (
    cumulative_usage,
    logit_raster,
    per_day_error_rates,
    vocab_condition_comparison,
    words_per_minute,
)
