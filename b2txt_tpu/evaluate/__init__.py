from .harness import (
    TrialEval,
    evaluate_sessions,
    run_single_decoding_step,
    write_competition_csv,
)
