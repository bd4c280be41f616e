"""b2txt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-neuroprosthesis decoding framework.

A ground-up rebuild of the capabilities of Neuroprosthetics-Lab/nejm-brain-to-text
(Card et al., NEJM 2024 + Brain-to-Text '25 baseline): 512-channel neural features →
day-adapted GRU phoneme decoder → CTC → n-gram/LLM-fused beam search → text.

Subpackages
-----------
- ``utils``     config / logging / phoneme tables / metrics (replaces OmegaConf+argparse+gflags)
- ``ops``       smoothing, augmentations, CTC loss, Pallas kernels
- ``models``    GRUDecoder + PyTorch checkpoint importer
- ``data``      HDF5 session store, batch samplers, device prefetch
- ``train``     optax trainer with the reference's 3-param-group AdamW + cosine warmup
- ``decode``    greedy / prefix beam search / lexicon+n-gram fused beam search
- ``lm``        ARPA n-gram models, lexicon, corpus tooling (replaces SRILM/OpenFST path)
- ``serve``     streaming decode service (reset/update/decode/finalize protocol)
- ``evaluate``  45-session PER/WER harness + competition CSV writer
- ``parallel``  mesh construction and sharded training/serving
"""

__version__ = "0.1.0"
