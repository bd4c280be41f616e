from .figures import (
    cumulative_usage,
    logit_raster,
    per_day_error_rates,
    vocab_condition_comparison,
    words_per_minute,
)
from .plots import (
    plot_correctness_by_day,
    plot_correctness_pie,
    plot_cumulative_usage,
    plot_error_rates_by_day,
    plot_logit_raster,
    plot_wpm_by_day,
)
from .notebook_data import (
    copy_task_error_rates,
    export_copy_task_pickle,
    personal_use_summary,
    render_figure_2,
    render_figure_4,
)
