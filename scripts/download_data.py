#!/usr/bin/env python
"""Download the t15 copy-task dataset from Dryad (reference: download_data.py).

  python scripts/download_data.py [--out data/] [--doi DOI]
Requires network access.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data")
    p.add_argument("--doi", default=None)
    args = p.parse_args()

    from b2txt_tpu.data.download import DRYAD_DOI, download_dataset

    paths = download_dataset(args.out, doi=args.doi or DRYAD_DOI)
    print(f"Downloaded {len(paths)} files to {args.out}")


if __name__ == "__main__":
    main()
