"""Guard the online streaming example (examples/streaming_demo.py): the
carried-state GRU must match the offline forward, and the incremental
DecoderService decode must grow the partial sentence to the exact final.
Mirrors the reference's closed-loop flow (evaluate_model.py stage 2 with
per-chunk partials; rnn_model.py streaming states)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_streaming_demo_end_to_end():
    import streaming_demo

    out = streaming_demo.main(verbose=False)
    assert out["final"].sentence == out["sentence"]
    assert out["partials"][-1] == out["sentence"]
    # partials only ever extend (word-synchronous beam: closed words stay)
    words = [p.split() for p in out["partials"]]
    for a, b in zip(words, words[1:]):
        assert b[: len(a)] == a
    # the n-best carries the reference's 5-tuple scoring
    assert len(out["final"].nbest[0]) == 5
    assert out["hop_ms"] > 0
