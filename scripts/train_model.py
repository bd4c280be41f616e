#!/usr/bin/env python
"""Train the GRU phoneme decoder (reference: model_training/train_model.py).

Usage: python scripts/train_model.py [path/to/rnn_args.yaml]
The reference's rnn_args.yaml layout loads unchanged.
"""

import sys

sys.path.insert(0, ".")

from b2txt_tpu.train import Trainer
from b2txt_tpu.utils import load_args_yaml


def main() -> None:
    args_path = sys.argv[1] if len(sys.argv) > 1 else "rnn_args.yaml"
    cfg = load_args_yaml(args_path)
    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
