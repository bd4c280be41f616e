"""Lattice n-best depth + exactness (VERDICT r4 items: lattice-depth n-best
evidence, n-best depth unverified).

Reference tie-in: the production n-best is ShortestPath over a determinized
Kaldi lattice (ctc_wfst_beam_search.cc:123-160) whose depth comes from
token-passing recombination at max_active=7000 states. The rebuild's
provenance-graph lattice (decode/lattice.py + LexiconBeamSearch
state_key="ngram") restores that mechanism; these tests pin its guarantees:

  * no candidate ever OVERESTIMATES the forced-alignment oracle
    (forced_rank — a spliced path overestimating would mean a splice bug);
  * top-1 equals the beam's own best (and the optimal forced alignment in
    the unpruned regime);
  * candidate lists reach nbest depth on soft posteriors at wide beams,
    where the surviving-beam pool collapses to a handful;
  * oracle WER of the lattice list improves on the pool's.
"""

import numpy as np
import pytest

from b2txt_tpu.data.synthetic import ctc_logprobs
from b2txt_tpu.decode.lattice import forced_rank
from b2txt_tpu.decode.lmbeam import LexiconBeamSearch
from b2txt_tpu.lm.lexicon import Lexicon
from b2txt_tpu.lm.ngram import train_ngram
from b2txt_tpu.utils.config import DecodeConfig
from b2txt_tpu.utils.metrics import edit_distance
from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    phones = LOGIT_TO_PHONEME[1:40]
    words = {}
    while len(words) < 500:
        L = rng.integers(3, 8)
        pron = [phones[i] for i in rng.integers(0, 39, L)]
        words["w" + "".join(p.lower() for p in pron)] = pron
    wl = list(words)
    lex = Lexicon.from_words(words)
    sents = [" ".join(wl[i] for i in rng.integers(0, 500, 4))
             for _ in range(40)]
    lm = train_ngram([s.split() for s in sents], order=3)
    wid = {w: i for i, w in enumerate(lex.words)}
    return lex, lm, sents, wid, rng


def _rank(cfg, c):
    return cfg.acoustic_scale * c.ac_score + c.lm_score


@pytest.mark.parametrize("state_key", ["history", "ngram"])
def test_no_overestimate_vs_forced_oracle(world, state_key):
    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=100,
                       beam_width=48, first_beam_size=8, sum_mode=False)
    bs = LexiconBeamSearch(lex, lm, cfg, max_homophones=4,
                           state_key=state_key, record_lattice=True)
    for sent in sents[:4]:
        ids = lex.sentence_to_phonemes(sent)
        lp = ctc_logprobs(rng, ids, noise=2.5)
        bs.reset()
        bs.decode(lp)
        for c in bs.nbest_lattice()[:30]:
            f = forced_rank(lp, [wid[w] for w in c.sentence.split()],
                            lex, lm, cfg)
            assert _rank(cfg, c) <= f + 1e-6, (c.sentence, _rank(cfg, c), f)


def test_top1_exact_in_unpruned_regime(world):
    """No first-beam prune + wide beam + peaked posteriors: lattice top-1 is
    the truth AND scores exactly the forced-alignment optimum."""
    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=50,
                       beam_width=256, first_beam_size=0, sum_mode=False)
    bs = LexiconBeamSearch(lex, lm, cfg, max_homophones=4, state_key="ngram")
    for sent in sents[:3]:
        ids = lex.sentence_to_phonemes(sent)
        lp = ctc_logprobs(rng, ids, noise=0.3)
        bs.reset()
        bs.decode(lp)
        lat = bs.nbest_lattice()
        assert lat[0].sentence == sent
        f = forced_rank(lp, [wid[w] for w in sent.split()], lex, lm, cfg)
        assert abs(_rank(cfg, lat[0]) - f) < 1e-6
        # descending, deduped
        ranks = [_rank(cfg, c) for c in lat]
        assert all(ranks[i] >= ranks[i + 1] - 1e-9
                   for i in range(len(ranks) - 1))
        assert len({c.sentence for c in lat}) == len(lat)


def test_lattice_depth_reaches_nbest_on_soft_posteriors(world):
    """The headline guarantee: on soft posteriors at a Kaldi-scale state
    budget the lattice list reaches nbest depth, where the surviving-beam
    pool measures ~1-8 (scripts/quality_ladder.py)."""
    lex, lm, sents, wid, rng = world
    nbest = 25
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=nbest,
                       beam_width=512, beam=17.0, lattice_beam=12.0,
                       first_beam_size=8, sum_mode=False)
    bs = LexiconBeamSearch(lex, lm, cfg, max_homophones=4, state_key="ngram")
    for sent in sents[:3]:
        ids = lex.sentence_to_phonemes(sent)
        lp = ctc_logprobs(rng, ids, noise=2.5)
        bs.reset()
        bs.decode(lp)
        lat = bs.nbest_lattice()
        assert len(lat) >= nbest, len(lat)


def test_lattice_improves_oracle_wer(world):
    """Oracle WER (best candidate in the list) must improve on the
    surviving-beam pool's — the quality the reference's lattice buys its
    OPT rescore input."""
    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=100,
                       beam_width=512, beam=17.0, lattice_beam=12.0,
                       first_beam_size=8, sum_mode=False)
    # pool baseline: canonical-width history-keyed searcher
    cfg_pool = cfg.replace(beam_width=48)
    bs_lat = LexiconBeamSearch(lex, lm, cfg, max_homophones=4,
                               state_key="ngram")
    bs_pool = LexiconBeamSearch(lex, lm, cfg_pool, max_homophones=4)
    d_lat = tot = d_pool = 0
    for sent in sents[:6]:
        ids = lex.sentence_to_phonemes(sent)
        lp = ctc_logprobs(rng, ids, noise=2.2)
        ref = sent.split()
        bs_lat.reset()
        bs_lat.decode(lp)
        lat = bs_lat.nbest_lattice()
        bs_pool.reset()
        bs_pool.decode(lp)
        pool = bs_pool.finish_decoding()
        d_lat += min(edit_distance(ref, c.sentence.split()) for c in lat)
        d_pool += min(edit_distance(ref, c.sentence.split()) for c in pool)
        tot += len(ref)
    assert d_lat <= d_pool, (d_lat, d_pool)
    assert d_lat < tot  # the deep list actually recovers words


def test_finish_decoding_lattice_mode(world):
    """config.lattice_nbest routes finish_decoding through the lattice."""
    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=40,
                       beam_width=256, lattice_beam=10.0, first_beam_size=8,
                       sum_mode=False, lattice_nbest=True)
    bs = LexiconBeamSearch(lex, lm, cfg, max_homophones=4, state_key="ngram")
    ids = lex.sentence_to_phonemes(sents[0])
    lp = ctc_logprobs(rng, ids, noise=2.0)
    bs.reset()
    bs.decode(lp)
    out = bs.finish_decoding()
    assert out == bs._finalized
    assert len(out) > 8
    assert len({c.sentence for c in out}) == len(out)


def test_no_overestimate_homophones_order2_length_penalty():
    """Exactness property under the harder configuration space: homophone
    classes up to 6 (multiple closes per node per frame), an ORDER-2 LM
    (single-word context tails recombine aggressively) and a nonzero
    length_penalty — every lattice candidate must still respect the
    forced-alignment oracle."""
    from b2txt_tpu.data.adversarial import homophone_lexicon, zipf_corpus

    rng = np.random.default_rng(11)
    words, by_freq = homophone_lexicon(rng, 600)
    lex = Lexicon.from_words(words)
    lm = train_ngram(zipf_corpus(rng, by_freq, 1500) + [[w] for w in words],
                     order=2)
    wid = {w: i for i, w in enumerate(lex.words)}
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=40,
                       beam_width=128, lattice_beam=10.0, first_beam_size=8,
                       sum_mode=False, length_penalty=0.5)
    bs = LexiconBeamSearch(lex, lm, cfg, max_homophones=6, state_key="ngram")
    for i in range(4):
        ws = [by_freq[r]
              for r in np.random.default_rng(50 + i).choice(300, size=4)]
        ids = lex.sentence_to_phonemes(" ".join(ws))
        lp = ctc_logprobs(np.random.default_rng(60 + i), ids, noise=1.8)
        bs.reset()
        bs.decode(lp)
        for c in bs.nbest_lattice()[:12]:
            f = forced_rank(lp, [wid[w] for w in c.sentence.split()],
                            lex, lm, cfg)
            assert _rank(cfg, c) <= f + 1e-6, (c.sentence, _rank(cfg, c), f)


def test_native_lattice_matches_python_oracle(world, tmp_path):
    """The C++ lattice (runtime/decoder.cc FinalizeLattice — the production
    deep-nbest path, mirroring the reference's C++ lattice ShortestPath)
    must reproduce the python oracle's list: same depth, same sentences,
    scores within float32 tolerance, and no forced-oracle overestimates."""
    import b2txt_tpu.lm.lexicon as L
    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME

    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=40,
                       beam_width=256, lattice_beam=10.0, first_beam_size=8,
                       sum_mode=False, lattice_nbest=True)
    py = LexiconBeamSearch(lex, lm, cfg, max_homophones=4, state_key="ngram")
    arpa = str(tmp_path / "lm.arpa")
    lm.to_arpa(arpa)
    lexp = str(tmp_path / "lex.txt")
    with open(lexp, "w") as f:
        for w, i in lex.word_ids.items():
            for pron in lex.prons[i]:
                f.write(f"{w.upper()}  "
                        f"{' '.join(LOGIT_TO_PHONEME[p] for p in pron)}\n")
    nat = NativeLexiconBeamSearch(arpa, lexp, cfg, max_homophones=4,
                                  state_key="ngram")
    for sent in sents[:4]:
        ids = lex.sentence_to_phonemes(sent)
        lp = ctc_logprobs(rng, ids, noise=2.0)
        py.reset()
        py.decode(lp)
        rp = py.finish_decoding()
        nat.reset()
        nat.decode(lp)
        rn = nat.finish_decoding()
        assert rp[0].sentence == rn[0].sentence
        assert len(rp) == len(rn)
        pd = {c.sentence: _rank(cfg, c) for c in rp}
        nd = {c.sentence: _rank(cfg, c) for c in rn}
        assert set(pd) == set(nd)
        for s in pd:
            assert abs(pd[s] - nd[s]) < 1e-4, (s, pd[s], nd[s])
        for c in rn[:10]:
            f = forced_rank(lp, [wid[w] for w in c.sentence.split()],
                            lex, lm, cfg)
            assert _rank(cfg, c) <= f + 1e-4


def test_service_lattice_mode(world, tmp_path):
    """DecoderService(config.lattice_nbest) builds ngram-keyed searchers;
    the device backend refuses with a clear message."""
    from b2txt_tpu.serve.service import DecoderService

    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=30,
                       beam_width=256, lattice_beam=10.0, first_beam_size=8,
                       sum_mode=False, lattice_nbest=True)
    svc = DecoderService(lex, lm, cfg, searcher_backend="native")
    assert svc.searcher.state_key == "ngram"
    ids = lex.sentence_to_phonemes(sents[0])
    lp = ctc_logprobs(rng, ids, noise=2.0)
    svc.reset()
    out = svc.decode_utterance(lp)
    assert out.sentence  # soft posteriors: top-1 need not be truth
    assert len(out.nbest) > 5  # the deep lattice list reaches the output
    with pytest.raises(ValueError, match="lattice_nbest"):
        DecoderService(lex, lm, cfg, searcher_backend="device")


def test_device_ngram_keying_parity(world):
    """DeviceLexiconBeamSearch(state_key='ngram') — the Kaldi token-passing
    state space on chip (LM-context hash identity; the winner-payload sort
    key keeps (parent, word, lm, ctx) consistent with the merged maximum) —
    must agree with the python ngram-keyed oracle's top-1 on peaked
    posteriors, and with the history-keyed device searcher."""
    import jax

    from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch

    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=10,
                       beam_width=32, first_beam_size=8, sum_mode=False)
    dev_n = DeviceLexiconBeamSearch(lex, lm, cfg, max_homophones=4,
                                    state_key="ngram")
    dev_h = DeviceLexiconBeamSearch(lex, lm, cfg, max_homophones=4)
    py_n = LexiconBeamSearch(lex, lm, cfg, max_homophones=4,
                             state_key="ngram")
    utts = []
    for sent in sents[:6]:
        ids = lex.sentence_to_phonemes(sent)
        utts.append((sent, ctc_logprobs(rng, ids, noise=0.4)))
    lens = np.array([lp.shape[0] for _, lp in utts], np.int32)
    T = int(lens.max())
    batch = np.full((len(utts), T, 41), -20.0, np.float32)
    for i, (_, lp) in enumerate(utts):
        batch[i, : lp.shape[0]] = lp
    out_n = dev_n.decode_batch(batch, lens)
    out_h = dev_h.decode_batch(batch, lens)
    for i, (sent, lp) in enumerate(utts):
        py_n.reset()
        py_n.decode(lp)
        rp = py_n.finish_decoding()
        assert out_n[i][0].sentence == rp[0].sentence == sent
        assert out_h[i][0].sentence == sent
    # sum_mode is rejected (merging different sentences would pool mass)
    with pytest.raises(ValueError, match="sum_mode"):
        DeviceLexiconBeamSearch(lex, lm, cfg.replace(sum_mode=True),
                                state_key="ngram")


def test_ngram_keying_top1_matches_history_keying(world):
    """state_key='ngram' (Kaldi token-passing state space) must not change
    the decoded top-1 on peaked posteriors — the LM context is a sufficient
    statistic, truncation only re-allocates beam slots."""
    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=10,
                       beam_width=48, first_beam_size=8, sum_mode=False)
    a = LexiconBeamSearch(lex, lm, cfg, max_homophones=4)
    b = LexiconBeamSearch(lex, lm, cfg, max_homophones=4, state_key="ngram")
    for sent in sents[:6]:
        ids = lex.sentence_to_phonemes(sent)
        lp = ctc_logprobs(rng, ids, noise=0.4)
        a.reset()
        a.decode(lp)
        b.reset()
        b.decode(lp)
        ra = a.finish_decoding()
        rb = b.finish_decoding()
        assert ra[0].sentence == rb[0].sentence == sent


def test_setopt_runtime_lattice_toggle_python(world):
    """SetOpt parity for the lattice knob on the python searcher: enabling
    lattice_nbest between utterances re-derives recording (like
    decoder.cc's b2t_set_lattice_opt); enabling MID-utterance refuses — a
    graph recorded from mid-stream would be missing every earlier word."""
    lex, lm, sents, wid, rng = world
    plain = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=20,
                         beam_width=64, first_beam_size=8, sum_mode=False)
    bs = LexiconBeamSearch(lex, lm, plain, max_homophones=4)
    assert not bs.record_lattice
    bs.set_opt(plain.replace(lattice_nbest=True, lattice_beam=10.0))
    assert bs.record_lattice
    ids = lex.sentence_to_phonemes(sents[0])
    lp = ctc_logprobs(rng, ids, noise=2.0)
    bs.reset()
    bs.decode(lp)
    out = bs.finish_decoding()  # lattice path, no ValueError
    assert out and out[0].sentence
    # sum_mode combined with lattice_nbest is rejected at set_opt
    with pytest.raises(ValueError, match="sum_mode"):
        bs.set_opt(plain.replace(lattice_nbest=True, sum_mode=True))
    # mid-utterance enable refuses
    bs2 = LexiconBeamSearch(lex, lm, plain, max_homophones=4)
    bs2.reset()
    bs2.decode(lp[:20])
    with pytest.raises(ValueError, match="mid-utterance"):
        bs2.set_opt(plain.replace(lattice_nbest=True))


def test_setopt_runtime_lattice_toggle_native(world, tmp_path):
    """The C++ decoder latches the recording gate per utterance: a fresh
    set_opt enables the lattice finalize, while a MID-utterance toggle
    degrades to the pool finalize (full sentences) for that utterance
    instead of backtracing a truncated lattice."""
    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.phonemes import LOGIT_TO_PHONEME

    lex, lm, sents, wid, rng = world
    plain = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=20,
                         beam_width=64, first_beam_size=8, sum_mode=False)
    lat = plain.replace(lattice_nbest=True, lattice_beam=10.0,
                        beam_width=256)
    arpa = str(tmp_path / "lm.arpa")
    lm.to_arpa(arpa)
    lexp = str(tmp_path / "lex.txt")
    with open(lexp, "w") as f:
        for w, i in lex.word_ids.items():
            for pron in lex.prons[i]:
                f.write(f"{w.upper()}  "
                        f"{' '.join(LOGIT_TO_PHONEME[p] for p in pron)}\n")

    ids = lex.sentence_to_phonemes(sents[0])
    lp = ctc_logprobs(rng, ids, noise=2.0)

    # enable via set_opt on a FRESH decoder (no reset in between): the
    # re-latch in b2t_set_lattice_opt must arm recording
    nat = NativeLexiconBeamSearch(arpa, lexp, plain, max_homophones=4)
    nat.set_opt(lat)
    nat.decode(lp)
    toggled = nat.finish_decoding()
    ref = NativeLexiconBeamSearch(arpa, lexp, lat, max_homophones=4,
                                  state_key="history")
    ref.reset()
    ref.decode(lp)
    want = ref.finish_decoding()
    assert toggled[0].sentence == want[0].sentence
    assert len(toggled) == len(want) > 3  # the deep lattice list, not pool

    # MID-utterance toggle: pool finalize for this utterance (no truncated
    # sentences), lattice from the next reset on
    nat2 = NativeLexiconBeamSearch(arpa, lexp, plain, max_homophones=4)
    nat2.reset()
    nat2.decode(lp[:40])
    nat2.set_opt(lat)
    nat2.decode(lp[40:])
    mid = nat2.finish_decoding()
    plain_ref = NativeLexiconBeamSearch(arpa, lexp, plain, max_homophones=4)
    plain_ref.reset()
    plain_ref.decode(lp)
    pool = plain_ref.finish_decoding()
    assert mid[0].sentence == pool[0].sentence  # full, not truncated
    nat2.reset()
    nat2.decode(lp)
    after = nat2.finish_decoding()
    assert after[0].sentence == want[0].sentence
    assert len(after) == len(want)


def test_device_setopt_guards(world):
    """DeviceLexiconBeamSearch.set_opt mirrors its constructor validation:
    runtime reconfiguration cannot reach sum_mode under ngram keying (score
    corruption) or lattice_nbest (unsupported on the pool searcher)."""
    from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch

    lex, lm, sents, wid, rng = world
    cfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=10,
                       beam_width=16, first_beam_size=8, sum_mode=False)
    dev = DeviceLexiconBeamSearch(lex, lm, cfg, max_homophones=4,
                                  state_key="ngram")
    with pytest.raises(ValueError, match="sum_mode"):
        dev.set_opt(cfg.replace(sum_mode=True))
    with pytest.raises(ValueError, match="lattice_nbest"):
        dev.set_opt(cfg.replace(lattice_nbest=True))
    dev.set_opt(cfg.replace(blank_penalty=50.0))  # valid updates still work
    assert dev.config.blank_penalty == 50.0
