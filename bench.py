"""Headline benchmark: sentence decode throughput on one chip.

Runs the flagship full-size model (512 feat → 5×768 GRU → 41 classes, 45 day
layers — rnn_args.yaml shapes) over realistic utterances (~400 20 ms bins ≈ 8 s
of speech, batch 64, bf16) with the inference-path preprocessing (valid-padding
Gaussian smoothing) and greedy CTC decoding, and prints ONE JSON line.

Baseline: the reference decodes the ~1,450-trial test split in 15–20 min on an
RTX 4090 (evaluate_model.py:185) ≈ 1.38 sentences/s end-to-end. vs_baseline is
our sentences/s over that. (The LM fusion stage runs host-side this round and
is benchmarked separately in later rounds as the TPU-resident search lands.)
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SENTENCES_PER_SEC = 1450 / (17.5 * 60)  # mid of 15–20 min window


def main() -> None:
    import jax
    import jax.numpy as jnp

    from b2txt_tpu.models import gru_decoder
    from b2txt_tpu.ops.ctc import greedy_decode_ids
    from b2txt_tpu.ops.smoothing import gauss_smooth
    from b2txt_tpu.utils import TrainConfig

    cfg = TrainConfig()
    params = gru_decoder.init_params_from_config(
        jax.random.PRNGKey(0), cfg.model, n_days=45, n_classes=41
    )

    B, T, D = 64, 400, 512  # ~8 s utterances at 20 ms bins
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    day_idx = jnp.asarray(np.arange(B) % 45, jnp.int32)
    dt = cfg.dataset.data_transforms

    @jax.jit
    def decode_batch(params, x, day_idx):
        sm = gauss_smooth(
            x, std=dt.smooth_kernel_std, size=dt.smooth_kernel_size, padding="valid"
        )
        logits = gru_decoder.forward(
            params, sm, day_idx,
            patch_size=cfg.model.patch_size, patch_stride=cfg.model.patch_stride,
            compute_dtype=jnp.bfloat16,
        )
        P = logits.shape[1]
        lens = jnp.full((B,), P, jnp.int32)
        return greedy_decode_ids(logits.astype(jnp.float32), lens)

    # Two pre-staged inputs (alternated) so no call can be answer-cached.
    x2 = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    inputs = [x, x2]

    # warmup/compile; np.asarray forces a real device->host fetch —
    # block_until_ready alone does not reliably synchronize through the
    # axon remote-TPU tunnel, and the decoded ids are needed host-side anyway.
    np.asarray(decode_batch(params, x, day_idx))

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        ids = np.asarray(decode_batch(params, inputs[i % 2], day_idx))
    dt_s = time.perf_counter() - t0

    sentences_per_sec = (B * iters) / dt_s
    bins_per_sec = (B * T * iters) / dt_s
    us_per_bin_per_chip = 1e6 / bins_per_sec

    print(json.dumps({
        "metric": "sentences_per_sec_rnn_greedy",
        "value": round(sentences_per_sec, 2),
        "unit": "sentences/s",
        "vs_baseline": round(sentences_per_sec / BASELINE_SENTENCES_PER_SEC, 2),
        "extra": {
            "per_bin_latency_us": round(us_per_bin_per_chip, 3),
            "batch": B, "bins_per_sentence": T,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
