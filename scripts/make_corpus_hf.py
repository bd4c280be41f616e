#!/usr/bin/env python
"""Build an LM training corpus from a HuggingFace dataset
(reference: language_model/utils/download_hf_dataset.py + build_ngram_lm.ipynb).

Streams the dataset's text column through the corpus normalizer into a flat
one-sentence-per-line file ready for scripts/build_lm.py. Requires the
``datasets`` package + network access (gated).

  python scripts/make_corpus_hf.py --dataset openwebtext --out corpus.txt \
      --dict cmudict.dict [--split train --text-column text --limit 1000000]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--text-column", default="text")
    p.add_argument("--out", required=True)
    p.add_argument("--dict", default=None,
                   help="lexicon file; sentences with OOV words are dropped")
    p.add_argument("--limit", type=int, default=0, help="max sentences (0=all)")
    p.add_argument("--numbers-to-words", action="store_true")
    args = p.parse_args()

    try:
        from datasets import load_dataset
    except ImportError:
        sys.exit("The `datasets` package is required: pip install datasets")

    from b2txt_tpu.lm import format_corpus, load_lexicon_file
    from b2txt_tpu.lm.corpus import convert_numbers_to_words

    lex_words = None
    if args.dict:
        lex_words = set(load_lexicon_file(args.dict).keys())

    ds = load_dataset(args.dataset, args.config, split=args.split, streaming=True)

    def lines():
        for row in ds:
            text = row.get(args.text_column, "")
            if args.numbers_to_words:
                text = convert_numbers_to_words(text)
            yield text

    n = 0
    with open(args.out, "w") as f:
        for sent in format_corpus(lines(), lexicon_words=lex_words):
            f.write(sent + "\n")
            n += 1
            if n % 100000 == 0:
                print(n)
            if args.limit and n >= args.limit:
                break
    print(f"Wrote {n} sentences to {args.out}")


if __name__ == "__main__":
    main()
