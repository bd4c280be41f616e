#!/usr/bin/env python
"""Simulated online streaming decode: causal bin-by-bin GRU with carried state
+ incremental LM beam search (PROGRESS config 5; reference: the closed-loop
flow of evaluate_model.py stage 2 with per-chunk partial decoding).

Every patch_stride (4) new 20 ms bins, the last patch_size (14) bins are
day-transformed + patched into one GRU step (streaming hidden state), the new
logit frame goes into the incremental beam search, and a partial sentence is
available. Reports per-update latency (one 80 ms hop) and the amortized
device-side step time (N steps chained in one jit call — the tunnel round-trip
otherwise dominates single-step numbers on this remote-TPU rig).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import argparse

    argparse.ArgumentParser(
        description="Simulated online streaming decode benchmark "
        "(per-80 ms-hop latency; no options — production shapes)"
    ).parse_args()

    import jax
    import jax.numpy as jnp

    from b2txt_tpu.models import gru_decoder
    from b2txt_tpu.utils import TrainConfig

    cfg = TrainConfig()
    D, H, L = cfg.model.n_input_features, cfg.model.n_units, cfg.model.n_layers
    PATCH, STRIDE = cfg.model.patch_size, cfg.model.patch_stride
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=45, n_classes=41
    )

    @jax.jit
    def stream_step(params, h, window, day_idx):
        """One online update: 14-bin window -> 1 logit frame + new state."""
        logits, h2 = gru_decoder.forward(
            params, window[None], day_idx,
            states=h, return_state=True,
            patch_size=PATCH, patch_stride=STRIDE,
            compute_dtype=jnp.bfloat16,
        )
        return logits[0, 0], h2

    @jax.jit
    def stream_many(params, h, windows, day_idx):
        """N chained updates in one device call (amortized timing)."""
        def body(h, w):
            lg, h2 = stream_step(params, h, w, day_idx)
            return h2, lg

        h, lgs = jax.lax.scan(body, h, windows)
        return lgs, h

    rng = np.random.default_rng(0)
    day_idx = jnp.asarray([0])
    h0 = jnp.broadcast_to(params["h0"], (L, 1, H)).astype(jnp.bfloat16)

    # single-update latency (includes host<->device round trip)
    w = jnp.asarray(rng.standard_normal((PATCH, D)), jnp.float32)
    lg, h = stream_step(params, h0, w, day_idx)
    np.asarray(lg)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        lg, h = stream_step(params, h0, w, day_idx)
        np.asarray(lg)
        lat.append(time.perf_counter() - t0)
    lat_ms = 1000 * np.asarray(lat)

    # amortized device step time
    N = 256
    ws = jnp.asarray(rng.standard_normal((N, PATCH, D)), jnp.float32)
    np.asarray(stream_many(params, h0, ws, day_idx)[0])
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(stream_many(params, h0, ws, day_idx)[0])
    amortized_us = 1e6 * (time.perf_counter() - t0) / (4 * N)

    # incremental LM decode latency per frame (native C++)
    import os
    import tempfile

    from b2txt_tpu.data import synthetic
    from b2txt_tpu.lm import Lexicon, train_ngram
    from b2txt_tpu.lm.lexicon import strip_stress
    from b2txt_tpu.runtime import NativeLexiconBeamSearch
    from b2txt_tpu.utils.config import DecodeConfig

    prons = synthetic.word_pronunciations()
    lm = train_ngram(synthetic.sentence_corpus(100), order=3)
    tmp = tempfile.mkdtemp()
    arpa = os.path.join(tmp, "lm.arpa")
    lm.to_arpa(arpa)
    lexp = os.path.join(tmp, "lexicon.txt")
    with open(lexp, "w") as f:
        for wd, pron in prons.items():
            f.write(f"{wd.upper()}  {' '.join(strip_stress(pron))}\n")
    dec = NativeLexiconBeamSearch(
        arpa, lexp, DecodeConfig(acoustic_scale=0.5, blank_penalty=1.0,
                                 nbest=5, beam_width=128)
    )
    lexicon = Lexicon.from_words(prons)
    ids = lexicon.sentence_to_phonemes("hello world brain text")
    frames = []
    for pid in ids:
        for _ in range(3):
            row = np.full(41, -8.0, np.float32)
            row[pid] = 0.0
            frames.append(row)
        blank = np.full(41, -8.0, np.float32)
        blank[0] = 0.0
        frames.append(blank)
    lp = np.stack(frames)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    dec.reset()
    lm_lat = []
    for t in range(lp.shape[0]):
        t0 = time.perf_counter()
        dec.decode(lp[t : t + 1])
        dec.result()
        lm_lat.append(time.perf_counter() - t0)
    lm_ms = 1000 * np.asarray(lm_lat)

    # fully device-resident hop: GRU step + device beam-search expand chained
    # in ONE scan — the amortized per-hop number isolates ON-CHIP work from
    # the axon tunnel RTT (a jax.profiler trace is unreliable through the
    # tunnel; N-in-one-call division is the device-side measurement).
    import math

    from b2txt_tpu.decode.lmbeam_jax import DeviceLexiconBeamSearch

    dcfg = DecodeConfig(acoustic_scale=0.325, blank_penalty=90.0, nbest=5,
                        beam_width=96, first_beam_size=8, sum_mode=False)
    dev = DeviceLexiconBeamSearch(lexicon, lm, dcfg)
    bstate = dev._make_state()
    log_bp = float(math.log(dcfg.blank_penalty))

    @jax.jit
    def device_hop_many(params, h, bstate, windows, day_idx):
        def body(carry, w):
            h, st = carry
            lg, h2 = gru_decoder.forward(
                params, w[None], day_idx, states=h, return_state=True,
                patch_size=PATCH, patch_stride=STRIDE,
                compute_dtype=jnp.bfloat16,
            )
            lp = jax.nn.log_softmax(lg[0, 0].astype(jnp.float32))
            lp = lp.at[0].add(-log_bp)
            st2, _, _, _ = dev._expand(
                st, lp, float(dcfg.acoustic_scale),
                float(dcfg.length_penalty), dcfg.first_beam_size, False,
            )
            return (h2, st2), lp[0]

        (h, st), out = jax.lax.scan(body, (h, bstate), windows)
        return out.sum(), h, st

    Nh = 128
    ws_h = jnp.asarray(rng.standard_normal((Nh, PATCH, D)), jnp.float32)
    float(np.asarray(device_hop_many(params, h0, bstate, ws_h, day_idx)[0]))
    t0 = time.perf_counter()
    for _ in range(4):
        float(np.asarray(device_hop_many(params, h0, bstate, ws_h, day_idx)[0]))
    device_hop_us = 1e6 * (time.perf_counter() - t0) / (4 * Nh)

    hop_ms = STRIDE * 20.0
    print(f"online hop: {hop_ms:.0f} ms of neural data per update")
    print(f"fully device-resident hop (GRU step + device LM expand, "
          f"on-chip amortized): {device_hop_us:.1f} us/update "
          f"({0.1 * device_hop_us / hop_ms:.2f}% of the real-time budget)")
    print(f"model update latency: median {np.median(lat_ms):.2f} ms, "
          f"p90 {np.percentile(lat_ms, 90):.2f} ms (incl. remote-TPU round trip)")
    print(f"model device step, amortized: {amortized_us:.1f} us/update")
    print(f"LM incremental step: median {np.median(lm_ms):.3f} ms, "
          f"p90 {np.percentile(lm_ms, 90):.3f} ms")
    total = np.median(lat_ms) + np.median(lm_ms)
    print(f"end-to-end per-update latency: ~{total:.2f} ms "
          f"({100 * total / hop_ms:.1f}% of the {hop_ms:.0f} ms real-time budget)")


if __name__ == "__main__":
    main()
