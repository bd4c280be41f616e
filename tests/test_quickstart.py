"""Guard the user-facing quickstart (examples/quickstart.py): the full
reference flow — synthetic sessions → Trainer → LM/lexicon build →
DecoderService decode → WER + competition CSV — must run end to end at a
reduced batch count. Mirrors the reference's train_model.py →
evaluate_model.py → language-model-standalone.py user journey."""

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_quickstart_end_to_end():
    import quickstart

    out = quickstart.main(n_batches=40)
    assert out["n_trials"] > 0
    # untrained-ish tiny model: only sanity-bound the metrics
    assert 0.0 <= out["greedy_PER"] <= 1.5
    assert 0.0 <= out["WER"] <= 1.5
    assert os.path.exists(out["csv_path"])
    with open(out["csv_path"]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "text"]
    assert len(rows) == out["n_trials"] + 1
