"""CLI-level coverage of the user-facing scripts/ entry points.

The reference ships its user journey as command lines (train_model.py,
evaluate_model.py, language-model-standalone.py, run.sh's graph build,
brain_speech_decoder_main); these tests drive OUR equivalents at the same
level — argparse surface and end-to-end file-in/file-out behavior — rather
than through library imports. --help must parse for every script, and the
artifact-producing CLIs (build_lm, decode_logits, convert_checkpoint) are run
for real on a tiny world.
"""

import glob
import os
import runpy
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SCRIPTS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REPO, "scripts", "*.py"))
)

DICT = """\
;;; tiny CMUdict-style fixture (stress digits exercised on purpose)
THE  DH AH0
CAT  K AE1 T
SAT  S AE1 T
MAT  M AE1 T
ON  AA1 N
THERE  DH EH1 R
THEIR  DH EH1 R
IS  IH1 Z
HAT  HH AE1 T
"""

CORPUS_LINES = [
    "the cat sat on the mat",
    "there is the cat",
    "the cat is there",
    "there is the mat",
    "the cat sat on the hat",
] * 4


def _run_main(script, argv, monkeypatch):
    """Execute scripts/<script> as __main__ with the given argv, in-process
    (keeps the conftest CPU forcing; still exercises the argparse surface)."""
    path = os.path.join(REPO, "scripts", script)
    monkeypatch.setattr(sys, "argv", [path] + argv)
    monkeypatch.chdir(REPO)
    runpy.run_path(path, run_name="__main__")


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help_parses(script):
    """Every script's argparse surface builds and --help exits 0."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", script), "--help"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, f"{script} --help failed:\n{r.stderr[-2000:]}"
    assert "usage" in r.stdout.lower()


def _write_world(tmp_path):
    dict_path = tmp_path / "dict.txt"
    dict_path.write_text(DICT)
    corpus_path = tmp_path / "corpus.txt"
    corpus_path.write_text("\n".join(CORPUS_LINES) + "\n")
    return str(dict_path), str(corpus_path)


def _clean_logits(phoneme_ids, n_classes=41, frames_per=3, hot=8.0):
    rows = []
    for pid in phoneme_ids:
        for _ in range(frames_per):
            row = np.full(n_classes, -hot, np.float32)
            row[pid] = 0.0
            rows.append(row)
        blank = np.full(n_classes, -hot, np.float32)
        blank[0] = 0.0
        rows.append(blank)
    return np.stack(rows)


def test_build_lm_then_decode_logits_cli(tmp_path, monkeypatch):
    """build_lm.py → lm dir; decode_logits.py reads it and decodes crafted
    logits to the planted sentences, identically on python and native
    backends (reference: run.sh graph build + decoder CLI)."""
    dict_path, corpus_path = _write_world(tmp_path)
    lm_dir = str(tmp_path / "lm3")
    _run_main(
        "build_lm.py",
        ["--corpus", corpus_path, "--dict", dict_path, "--out", lm_dir,
         "--order", "3", "--no-format"],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(lm_dir, "lm.arpa"))
    lex_lines = open(os.path.join(lm_dir, "lexicon.txt")).read()
    assert "cat" in lex_lines.lower()
    # stress digits must be stripped in the emitted lexicon
    assert "AE1" not in lex_lines

    from b2txt_tpu.lm import Lexicon, NGramLM

    lm = NGramLM.from_arpa(os.path.join(lm_dir, "lm.arpa"))
    lexicon = Lexicon.from_file(os.path.join(lm_dir, "lexicon.txt"), vocab=lm.vocab)

    sents = ["the cat sat on the mat", "there is the cat"]
    # one single-utterance file + one stacked (N,T,41) file, both layouts
    a = _clean_logits(lexicon.sentence_to_phonemes(sents[0]))
    b = _clean_logits(lexicon.sentence_to_phonemes(sents[1]))
    np.save(tmp_path / "utt_a.npy", a)
    tmax = max(a.shape[0], b.shape[0])

    def pad(x):  # pad with hot-blank frames (harmless under CTC)
        ext = np.full((tmax - x.shape[0], x.shape[1]), -8.0, np.float32)
        ext[:, 0] = 0.0
        return np.concatenate([x, ext]) if ext.shape[0] else x

    np.save(tmp_path / "utt_stack.npy", np.stack([pad(a), pad(b)]))

    outs = {}
    for backend in ("python", "native"):
        out = str(tmp_path / f"hyps_{backend}.txt")
        _run_main(
            "decode_logits.py",
            ["--lm_dir", lm_dir, "--logits", str(tmp_path / "utt_*.npy"),
             "--out", out, "--backend", backend,
             "--acoustic_scale", "0.5", "--blank_penalty", "1.0",
             "--beam_width", "64"],
            monkeypatch,
        )
        lines = [l.rstrip("\n") for l in open(out)]
        assert len(lines) == 3  # utt_a + 2 rows of utt_stack
        hyps = dict(l.split("\t") for l in lines)
        outs[backend] = hyps
        by_name = sorted(hyps)  # utt_a, utt_stack[0], utt_stack[1]
        assert hyps[by_name[0]] == sents[0]
        assert hyps[by_name[1]] == sents[0]
        assert hyps[by_name[2]] == sents[1]
    assert outs["python"] == outs["native"]


def test_build_lm_uniform_wordlist_cli(tmp_path, monkeypatch):
    """--uniform-from-wordlist builds the reference's uniform 1-gram variant."""
    dict_path, _ = _write_world(tmp_path)
    wl = tmp_path / "words.txt"
    wl.write_text("cat\nhat\nmat\n")
    lm_dir = str(tmp_path / "lm1")
    _run_main(
        "build_lm.py",
        ["--dict", dict_path, "--out", lm_dir,
         "--uniform-from-wordlist", str(wl)],
        monkeypatch,
    )
    from b2txt_tpu.lm import NGramLM

    lm = NGramLM.from_arpa(os.path.join(lm_dir, "lm.arpa"))
    assert sorted(w.lower() for w in lm.vocab if not w.startswith("<")) == [
        "cat", "hat", "mat"]


def _drive_standalone(tmp_path, monkeypatch, extra_argv):
    """Run language_model_standalone.py main() in a thread against fakeredis,
    decode one planted utterance over the wire protocol, return the final.

    Covers the CLI end to end: argparse → ARPA/lexicon load →
    DecoderService → RedisDecoderServer.run (reference:
    language-model-standalone.py:793-824 main + :514-790 loop)."""
    import threading
    import time

    from b2txt_tpu.serve import fakeredis

    fakeredis.install_fake_redis()
    fakeredis.reset_all()

    dict_path, corpus_path = _write_world(tmp_path)
    lm_dir = str(tmp_path / "lm")
    _run_main(
        "build_lm.py",
        ["--corpus", corpus_path, "--dict", dict_path, "--out", lm_dir,
         "--order", "3", "--no-format"],
        monkeypatch,
    )

    from b2txt_tpu.serve.redis_adapter import RedisDecoderServer
    from b2txt_tpu.serve.redis_client import RemoteLMClient

    captured = {}
    orig_run = RedisDecoderServer.run

    def run_capture(self, *a, **k):
        captured["server"] = self
        return orig_run(self, *a, **k)

    monkeypatch.setattr(RedisDecoderServer, "run", run_capture)
    # argv must be patched before the thread parses it
    path = os.path.join(REPO, "scripts", "language_model_standalone.py")
    monkeypatch.setattr(sys, "argv", [
        path, "--lm_path", lm_dir, "--searcher", "python",
        "--acoustic_scale", "0.5", "--blank_penalty", "1.0",
        "--nbest", "5", "--beam_width", "32", "--beam", "0.0",
    ] + extra_argv)
    monkeypatch.chdir(REPO)
    thread = threading.Thread(
        target=runpy.run_path, args=(path,), kwargs={"run_name": "__main__"},
        daemon=True,
    )
    thread.start()
    deadline = time.time() + 60
    while "server" not in captured and time.time() < deadline:
        time.sleep(0.02)
    assert "server" in captured, "CLI never reached the server loop"
    time.sleep(0.2)  # let the loop connect and set stream cursors
    assert thread.is_alive()

    try:
        from b2txt_tpu.lm import Lexicon, NGramLM
        from b2txt_tpu.utils.phonemes import rearrange_speech_logits

        lm = NGramLM.from_arpa(os.path.join(lm_dir, "lm.arpa"))
        lexicon = Lexicon.from_file(os.path.join(lm_dir, "lexicon.txt"),
                                    vocab=lm.vocab)
        client = RemoteLMClient()
        client.reset()
        sent = "the cat sat on the mat"
        logits = rearrange_speech_logits(
            _clean_logits(lexicon.sentence_to_phonemes(sent)))
        partial = client.send_logits(logits)
        assert partial
        final = client.finalize()
    finally:
        captured["server"].stop()
        thread.join(timeout=10)
    assert not thread.is_alive()
    return sent, final


def test_language_model_standalone_cli(tmp_path, monkeypatch):
    sent, final = _drive_standalone(tmp_path, monkeypatch, [])
    assert final.sentence == sent
    assert final.nbest and len(final.nbest[0]) == 5


def test_language_model_standalone_cli_jax_opt(tmp_path, monkeypatch):
    """--do_opt --opt_backend jax wires the TPU-native OPT rescorer into the
    serving loop (tiny shapes, random init); the finalize carries nonzero
    llm scores blended into the totals."""
    sent, final = _drive_standalone(
        tmp_path, monkeypatch,
        ["--do_opt", "--opt_backend", "jax", "--opt_size", "tiny",
         "--opt_random_init", "--alpha", "0.3"],
    )
    assert final.nbest and len(final.nbest[0]) == 5
    llm_scores = [c[3] for c in final.nbest]
    assert any(abs(s) > 1e-6 for s in llm_scores)
    # the planted sentence must still win under the 0.3-alpha blend of a
    # random tiny LLM (the ngram + acoustic margins are decisive here)
    assert final.sentence == sent


def test_convert_checkpoint_roundtrip_cli(tmp_path, monkeypatch):
    """tpu → torch → tpu through the CLI preserves every parameter."""
    import jax

    from b2txt_tpu.models import init_params
    from b2txt_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = init_params(
        jax.random.PRNGKey(0), neural_dim=16, n_units=12, n_days=2,
        n_classes=41, n_layers=2, patch_size=4, patch_stride=2,
    )
    src = str(tmp_path / "ckpt_tpu")
    save_checkpoint(src, params, val_per=0.25)

    pt = str(tmp_path / "ckpt.pt")
    _run_main("convert_checkpoint.py", ["--from-tpu", src, "--out", pt],
              monkeypatch)
    assert os.path.exists(pt)

    back = str(tmp_path / "ckpt_back")
    _run_main("convert_checkpoint.py", ["--from-torch", pt, "--out", back],
              monkeypatch)

    got = load_checkpoint(back)["params"]
    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(got)
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6,
                                   err_msg=str(ka))
