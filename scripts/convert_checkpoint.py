#!/usr/bin/env python
"""Convert checkpoints between the reference's PyTorch format and b2txt_tpu's.

  torch -> tpu:  python scripts/convert_checkpoint.py --from-torch ckpt.pt --out best_checkpoint
  tpu -> torch:  python scripts/convert_checkpoint.py --from-tpu best_checkpoint --out ckpt.pt
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--from-torch", dest="from_torch")
    p.add_argument("--from-tpu", dest="from_tpu")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    if bool(args.from_torch) == bool(args.from_tpu):
        p.error("exactly one of --from-torch / --from-tpu required")

    if args.from_torch:
        from b2txt_tpu.models import load_torch_checkpoint
        from b2txt_tpu.train.checkpoint import save_checkpoint

        params = load_torch_checkpoint(args.from_torch)
        save_checkpoint(args.out, params)
        print(f"Wrote b2txt_tpu checkpoint: {args.out}")
    else:
        import torch

        from b2txt_tpu.models import state_dict_from_params
        from b2txt_tpu.train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(args.from_tpu)
        sd = {k: torch.tensor(v) for k, v in
              state_dict_from_params(ckpt["params"]).items()}
        torch.save({"model_state_dict": sd,
                    "val_PER": ckpt.get("val_PER", float("inf")),
                    "val_loss": ckpt.get("val_loss", float("inf"))}, args.out)
        print(f"Wrote torch checkpoint: {args.out}")


if __name__ == "__main__":
    main()
