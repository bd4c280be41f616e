"""Guard the driver's entry point: bench.py's main() runs end to end at a
tiny scale on the CPU backend and prints exactly ONE JSON line with the
required keys. (The real-scale TPU numbers live in BENCH_r*.json; this
catches wiring regressions in the connected-pipeline flow.)"""

import json
import subprocess
import sys


def test_bench_main_tiny(tmp_path):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv=['bench.py','--vocab','300','--utts','4',\n"
        "  '--device_batch','2','--bins','288']\n"
        "exec(open('bench.py').read())\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, r.stdout[-2000:]
    d = json.loads(json_lines[0])
    assert d["metric"] == "pipeline_sentences_per_sec"
    assert d["value"] > 0 and d["unit"] == "sentences/s"
    e = d["extra"]
    for key in ("connected", "device_pipeline_sentences_per_sec",
                "host_overlapped_sentences_per_sec", "device_wer",
                "native_wer", "rescore", "headline_mode",
                "per_bin_latency_us", "pipeline_per_bin_latency_us",
                "llm_finalize", "multipliers"):
        assert key in e, key
    assert e["connected"] is True
    # the LLM stage is skipped on the forced-CPU backend (6.7b forward is
    # impractical there) but must say so explicitly in the JSON
    assert e["llm_finalize"].get("skipped") is True
    assert e["multipliers"]["ngram_pipeline_vs_reference_full"] > 0
    # tiny-scale sanity: the planted fixture must still decode perfectly
    assert e["device_exact"] == "4/4"
    assert e["native_exact"] == "4/4"


def test_bench_llm_finalize_tiny():
    """--llm_tiny exercises the measured-in-run LLM finalize stage wiring
    (decode → on-chip rescore → augment → α-blend) with OPTConfig.tiny on
    the CPU backend; the JSON must carry the measured numbers and the
    tiny_model label (6.7b numbers come from the real-chip run)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv=['bench.py','--vocab','300','--utts','4',\n"
        "  '--device_batch','2','--bins','288','--llm_tiny',"
        "'--llm_utts','4']\n"
        "exec(open('bench.py').read())\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, r.stdout[-2000:]
    e = json.loads(json_lines[0])["extra"]
    llm = e["llm_finalize"]
    assert llm.get("measured_in_run") is True
    assert llm.get("tiny_model") is True
    assert llm["finalize_with_opt67b_sentences_per_s"] > 0
    assert llm["finalize_with_opt67b_exact"] == "4/4"
    # tiny-model rates must NOT feed the like-for-like 6.7b multiplier
    assert e["multipliers"]["llm_inclusive_vs_reference_full"] is None


def test_bench_main_tiny_adversarial(tmp_path):
    """--adversarial wiring: homophone-dense world, close_probe_top=2
    default (measured-best, ROUND4.md §5), lexicon stats in the JSON."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv=['bench.py','--adversarial','--vocab','300',\n"
        "  '--utts','4','--device_batch','2','--bins','288']\n"
        "exec(open('bench.py').read())\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, r.stdout[-2000:]
    d = json.loads(json_lines[0])
    e = d["extra"]
    assert e["adversarial"] is True
    assert e["close_probe_top"] == 2
    assert "lexicon_stats" in e
    # quality keys still present on the homophone-dense world
    assert "device_wer" in e and "native_wer" in e


def test_bench_guard_emits_error_json_on_outage(monkeypatch, capsys):
    """When every device probe hangs (the axon tunnel outage mode), the
    guard prints ONE honest JSON line with the headline metric name and
    exits 0 — an unattended bench run must never hang forever."""
    import bench
    import subprocess as sp

    def fake_run(*a, **kw):
        raise sp.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(bench, "_forced_cpu", lambda: False)
    monkeypatch.setattr(sp, "run", fake_run)
    import pytest as _pytest
    with _pytest.raises(SystemExit) as exc:
        bench._guard_tpu_reachable(None, attempts=2, probe_timeout=1, wait=0)
    assert exc.value.code == 0
    out = capsys.readouterr().out
    json_lines = [l for l in out.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1
    d = json.loads(json_lines[0])
    assert d["metric"] == "pipeline_sentences_per_sec"
    assert d["value"] == 0.0 and "error" in d


def test_bench_guard_noop_on_cpu(monkeypatch):
    """Forced-CPU runs (tests, the virtual mesh) never touch the tunnel."""
    import bench

    monkeypatch.setattr(bench, "_forced_cpu", lambda: True)
    bench._guard_tpu_reachable(None)  # returns without probing or printing
