#!/usr/bin/env python
"""Train the GRU phoneme decoder (reference: model_training/train_model.py).

Usage: python scripts/train_model.py [path/to/rnn_args.yaml]
The reference's rnn_args.yaml layout loads unchanged.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser(
        description="Train the GRU phoneme decoder from an rnn_args.yaml "
        "(the reference's file loads unchanged)")
    p.add_argument("args_yaml", nargs="?", default="rnn_args.yaml",
                   help="path to rnn_args.yaml (default: ./rnn_args.yaml)")
    args = p.parse_args()

    from b2txt_tpu.train import Trainer
    from b2txt_tpu.utils import load_args_yaml

    cfg = load_args_yaml(args.args_yaml)
    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
