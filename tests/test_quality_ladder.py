"""Guard for scripts/quality_ladder.py (VERDICT r4 items 4+6): the
soft-posterior gain sweep must run end to end, report per-backend
exact/WER/search-errors/pool-depth/oracle-WER, show cross-backend agreement
on identical posteriors, and degrade monotonically as posteriors soften."""

import json
import subprocess
import sys


def test_quality_ladder_tiny():
    r = subprocess.run(
        [sys.executable, "scripts/quality_ladder.py", "--vocab", "300",
         "--utts", "6", "--device_batch", "3", "--bins", "288",
         "--gains", "18,45", "--lattice", "--lattice_width", "128",
         "--force_cpu"],
        capture_output=True, text=True, timeout=1500, cwd=".",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    gains = [row for row in rows if "gain" in row]
    summary = [row for row in rows if "summary" in row]
    assert len(gains) == 2 and len(summary) == 1
    for row in gains:
        for b in ("native", "device", "lattice"):
            for key in ("exact", "wer", "search_errors", "pool_depth_mean",
                        "oracle_wer", "sentences_per_s"):
                assert key in row[b], (b, key)
        # both canonical backends decode identical posteriors identically
        assert row["native"]["wer"] == row["device"]["wer"]
        assert row["top1_agreement"] == 1.0
        # the lattice list is at least as deep and its oracle at least as good
        assert (row["lattice"]["pool_depth_mean"]
                >= row["native"]["pool_depth_mean"])
        assert row["lattice"]["oracle_wer"] <= row["native"]["oracle_wer"]
    soft, sharp = gains[0], gains[1]
    assert soft["gain"] < sharp["gain"]
    # graceful degradation: softer posteriors decode no better
    assert soft["native"]["wer"] >= sharp["native"]["wer"]
    assert sharp["native"]["wer"] == 0.0  # calibrated point stays perfect
