"""Unified config system: typed dataclasses with YAML round-trip.

Replaces the reference's three config styles (OmegaConf YAML at
``model_training/rnn_args.yaml``, argparse CLIs, and C++ gflags) with one
dataclass tree. ``load_args_yaml`` accepts the reference's ``rnn_args.yaml``
layout verbatim so existing configs keep working.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(x) for x in obj]
    return obj


def _fromdict(cls: Any, d: Dict[str, Any]) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            v = _fromdict(f.type, v)
        kwargs[f.name] = v
    return cls(**kwargs)


@dataclass
class DataTransforms:
    """Augmentation + smoothing knobs (reference: rnn_args.yaml:61-70,
    rnn_trainer.py:436-484)."""

    white_noise_std: float = 1.0
    constant_offset_std: float = 0.2
    random_walk_std: float = 0.0
    random_walk_axis: int = -1
    static_gain_std: float = 0.0
    random_cut: int = 3
    smooth_kernel_size: int = 100
    smooth_data: bool = True
    smooth_kernel_std: float = 2.0


@dataclass
class InputNetworkConfig:
    """Day-specific input layer options (reference: rnn_args.yaml:10-15)."""

    n_input_layers: int = 1
    input_layer_sizes: List[int] = field(default_factory=lambda: [512])
    input_trainable: bool = True
    input_layer_dropout: float = 0.2


@dataclass
class ModelConfig:
    """GRU decoder architecture (reference: rnn_args.yaml:1-15, rnn_model.py:10-87)."""

    n_input_features: int = 512
    n_units: int = 768
    rnn_dropout: float = 0.4
    rnn_trainable: bool = True
    n_layers: int = 5
    patch_size: int = 14
    patch_stride: int = 4
    input_network: InputNetworkConfig = field(default_factory=InputNetworkConfig)


@dataclass
class DatasetConfig:
    """Dataset layout + sampling (reference: rnn_args.yaml:60-177)."""

    data_transforms: DataTransforms = field(default_factory=DataTransforms)
    neural_dim: int = 512
    batch_size: int = 64
    n_classes: int = 41
    max_seq_elements: int = 500
    days_per_batch: int = 4
    seed: int = 1
    num_dataloader_workers: int = 4
    loader_shuffle: bool = False
    must_include_days: Optional[List[int]] = None
    test_percentage: float = 0.1
    feature_subset: Optional[List[int]] = None
    dataset_dir: str = "../data/hdf5_data_final"
    bad_trials_dict: Optional[Dict[str, Any]] = None
    sessions: List[str] = field(default_factory=list)
    dataset_probability_val: List[int] = field(default_factory=list)


@dataclass
class TrainConfig:
    """Top-level training config mirroring every rnn_args.yaml knob."""

    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)

    gpu_number: str = "0"  # kept for config-compat; ignored on TPU
    mode: str = "train"
    use_amp: bool = True  # bf16 compute policy
    use_fused_preprocess: bool = False  # Pallas augment+smooth kernel (TPU)
    # Pallas VMEM-resident GRU recurrence (fwd + custom-VJP bwd). None = auto:
    # on for real TPU, off for the CPU test backend.
    use_pallas_gru: Optional[bool] = None
    # Host→device dtype of input_features batches ("float32" | "bfloat16").
    # bfloat16 halves the bytes on the host link (PCIe on a real v5e host,
    # the ~20 MB/s tunnel here) — the full-input training bottleneck; the
    # step upcasts on device, so compute is unchanged (see BatchLoader).
    feature_transfer_dtype: str = "float32"

    output_dir: str = "trained_models/baseline_rnn"
    checkpoint_dir: str = "trained_models/baseline_rnn/checkpoint"
    init_from_checkpoint: bool = False
    init_checkpoint_path: Optional[str] = None
    save_best_checkpoint: bool = True
    save_all_val_steps: bool = False
    save_final_model: bool = False
    save_val_metrics: bool = True
    early_stopping: bool = False
    early_stopping_val_steps: int = 20

    num_training_batches: int = 120000
    lr_scheduler_type: str = "cosine"
    lr_max: float = 0.005
    lr_min: float = 0.0001
    lr_decay_steps: int = 120000
    lr_warmup_steps: int = 1000
    lr_max_day: float = 0.005
    lr_min_day: float = 0.0001
    lr_decay_steps_day: int = 120000
    lr_warmup_steps_day: int = 1000

    beta0: float = 0.9
    beta1: float = 0.999
    epsilon: float = 0.1
    weight_decay: float = 0.001
    weight_decay_day: float = 0.0
    seed: int = 10
    grad_norm_clip_value: float = 10.0

    batches_per_train_log: int = 200
    batches_per_val_step: int = 2000
    batches_per_save: int = 0
    log_individual_day_val_PER: bool = True
    log_val_skip_logs: bool = False
    save_val_logits: bool = True
    save_val_data: bool = False

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        d = dict(d)
        if "model" in d and isinstance(d["model"], dict):
            m = dict(d["model"])
            if "input_network" in m and isinstance(m["input_network"], dict):
                m["input_network"] = _fromdict(InputNetworkConfig, m["input_network"])
            d["model"] = _fromdict(ModelConfig, m)
        if "dataset" in d and isinstance(d["dataset"], dict):
            ds = dict(d["dataset"])
            if "data_transforms" in ds and isinstance(ds["data_transforms"], dict):
                ds["data_transforms"] = _fromdict(DataTransforms, ds["data_transforms"])
            d["dataset"] = _fromdict(DatasetConfig, ds)
        return _fromdict(cls, d)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @classmethod
    def load(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))


# The reference's rnn_args.yaml is loadable unchanged: its key layout is exactly
# the dataclass field layout above.
load_args_yaml = TrainConfig.load


@dataclass
class DecodeConfig:
    """Language-model decode parameters (reference: language-model-standalone.py:795-822
    and lm_decoder.cc DecodeOptions)."""

    max_active: int = 7000
    min_active: int = 200
    beam: float = 17.0
    lattice_beam: float = 8.0
    acoustic_scale: float = 0.325
    ctc_blank_skip_threshold: float = 1.0
    length_penalty: float = 0.0
    nbest: int = 100
    blank_penalty: float = 90.0
    alpha: float = 0.55
    do_opt: bool = False
    rescore: bool = False
    top_candidates_to_augment: int = 20
    score_penalty_percent: float = 0.01
    # TPU beam-search sizing (new: fixed-width beams instead of Kaldi max_active)
    beam_width: int = 128
    # Restrict phone extensions to the frame's top-k phones (0 = all 39).
    # Shrinks the device searcher's per-frame sort ~3x; CTC posteriors are
    # peaked, so quality impact is nil at >= 8.
    first_beam_size: int = 0
    # Path-merge rule for hypotheses reaching the same (word history, trie
    # node, last phone) state: True = CTC-proper log-sum (the reference's
    # ctc_prefix_beam_search.cc semantics), False = Viterbi max (the
    # reference's Kaldi token passing over TLG.fst). All three searchers
    # honor it.
    sum_mode: bool = True
    # n-best from the word lattice of ALL recorded close events instead of
    # the surviving-beam pool (the reference's determinized-lattice
    # ShortestPath depth, ctc_wfst_beam_search.cc:123-160). Viterbi
    # (sum_mode=False) only; see decode/lattice.py.
    lattice_nbest: bool = False

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DecodeConfig":
        return _fromdict(cls, d)

    def replace(self, **kw) -> "DecodeConfig":
        return dataclasses.replace(self, **kw)
