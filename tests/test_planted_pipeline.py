"""Connected-pipeline tests: the full-size planted model's ACTUAL posteriors
feed the device beam search with no host round-trip (the coupling the
reference has at model_training/evaluate_model.py:158-237, rebuilt
device-resident)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b2txt_tpu.data.synthetic import phoneme_code, sentence_corpus, word_pronunciations
from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch
from b2txt_tpu.lm import Lexicon, train_ngram
from b2txt_tpu.models import gru_decoder
from b2txt_tpu.models.planted import (
    features_on_device,
    plant_frame_labels,
    planted_params,
)
from b2txt_tpu.ops.smoothing import gauss_smooth, gaussian_kernel
from b2txt_tpu.utils import TrainConfig
from b2txt_tpu.utils.config import DecodeConfig
from b2txt_tpu.utils.phonemes import greedy_collapse


@pytest.fixture(scope="module")
def world():
    lexicon = Lexicon.from_words(word_pronunciations())
    lm = train_ngram(sentence_corpus(), order=3)
    return lexicon, lm


@pytest.fixture(scope="module")
def stage1():
    """Full-size planted model + a jitted stage-1: labels → device logprobs."""
    cfg = TrainConfig()
    code = phoneme_code(cfg.model.n_input_features)
    params = planted_params(cfg.model, 45, code)
    dt = cfg.dataset.data_transforms
    ksize = len(gaussian_kernel(dt.smooth_kernel_std, dt.smooth_kernel_size))

    @jax.jit
    def run(labels, key):
        x = features_on_device(jnp.asarray(code), labels, key, noise=0.3)
        sm = gauss_smooth(x, std=dt.smooth_kernel_std,
                          size=dt.smooth_kernel_size, padding="valid")
        logits = gru_decoder.forward(
            params, sm, jnp.arange(labels.shape[0]) % 45,
            patch_size=cfg.model.patch_size,
            patch_stride=cfg.model.patch_stride,
            compute_dtype=jnp.bfloat16, use_pallas=False,
        )
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    return cfg, run, ksize


def _plant_batch(lexicon, sentences, T, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.full((len(sentences), T), -1, np.int32)
    for i, s in enumerate(sentences):
        ids = lexicon.sentence_to_phonemes(s)
        lab, n = plant_frame_labels(rng, ids, T)
        assert n == len(ids), f"{s} did not fit in T={T}"
        labels[i] = lab
    return labels


def test_planted_model_greedy_exact(world, stage1):
    """The handcrafted full-size weights emit peaked CTC posteriors whose
    greedy collapse is exactly the planted phoneme sequence."""
    lexicon, _ = world
    cfg, run, _ = stage1
    sentences = ["hello world day", "good brain text", "day good hello"]
    labels = _plant_batch(lexicon, sentences, T=288)
    lp = np.asarray(run(jnp.asarray(labels), jax.random.PRNGKey(1)))
    for i, s in enumerate(sentences):
        assert greedy_collapse(np.argmax(lp[i], -1)) == \
            lexicon.sentence_to_phonemes(s)


def test_connected_stage1_feeds_device_search(world, stage1):
    """HBM→HBM handoff: the stage-1 output array (a jax device Array) goes
    straight into decode_batch; at canonical production params the host
    compaction path must NOT run (no host transfer of the logits), and the
    decode recovers the planted transcripts."""
    lexicon, lm = world
    cfg, run, _ = stage1
    sentences = ["hello world day", "good brain text",
                 "day good hello", "brain text good world"]
    labels = _plant_batch(lexicon, sentences, T=288, seed=3)
    lp_dev = run(jnp.asarray(labels), jax.random.PRNGKey(2))
    assert isinstance(lp_dev, jax.Array)

    dcfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=5,
                        beam_width=64, beam=17.0, first_beam_size=8,
                        sum_mode=False)
    dev = DeviceLexiconBeamSearch(lexicon, lm, dcfg)

    # canonical regime (penalty 90, threshold 1.0): _prep_batch must keep the
    # device array resident — fail loudly if the host compaction ever runs
    import b2txt_tpu.decode.lmbeam_jax as M
    orig = M.compact_blank_skip

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("host blank-skip compaction ran on the "
                             "device-resident path")

    M.compact_blank_skip = boom
    try:
        out, lens, log_bp = dev._prep_batch(lp_dev, None)
        assert isinstance(out, jax.Array) and not isinstance(out, np.ndarray)
        results = dev.decode_batch(lp_dev)
    finally:
        M.compact_blank_skip = orig

    for i, s in enumerate(sentences):
        assert results[i][0].sentence == s

    # and the device-resident decode == decoding a host copy of the logits
    res_host = dev.decode_batch(np.asarray(lp_dev))
    for a, b in zip(results, res_host):
        assert [r.sentence for r in a[:3]] == [r.sentence for r in b[:3]]
        np.testing.assert_allclose(
            [r.lm_score for r in a[:3]], [r.lm_score for r in b[:3]],
            rtol=1e-5, atol=1e-5,
        )
