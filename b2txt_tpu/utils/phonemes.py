"""Phoneme tables and logit/text utilities.

Parity targets: ``model_training/evaluate_model_helpers.py:9-20`` (LOGIT_TO_PHONEME),
``nejm_b2txt_utils/general_utils.py:7-47`` (LOGIT_PHONE_DEF, logits_to_phonemes),
``evaluate_model_helpers.py:79-83`` (rearrange_speech_logits_pt), and the
``remove_punctuation`` normalizer shared by both reference modules.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np

# Model output channel order: [BLANK, 39 ARPAbet phones, SIL].
# Index 0 is the CTC blank; index 40 is the silence / word separator.
LOGIT_TO_PHONEME: List[str] = [
    "BLANK",
    "AA", "AE", "AH", "AO", "AW",
    "AY", "B", "CH", "D", "DH",
    "EH", "ER", "EY", "F", "G",
    "HH", "IH", "IY", "JH", "K",
    "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH",
    "T", "TH", "UH", "UW", "V",
    "W", "Y", "Z", "ZH",
    " | ",
]

# LM-facing channel order: [BLANK, SIL, 39 phones] (general_utils.py:7-17).
LOGIT_PHONE_DEF: List[str] = [
    "BLANK", "SIL",
    "AA", "AE", "AH", "AO", "AW",
    "AY", "B", "CH", "D", "DH",
    "EH", "ER", "EY", "F", "G",
    "HH", "IH", "IY", "JH", "K",
    "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH",
    "T", "TH", "UH", "UW", "V",
    "W", "Y", "Z", "ZH",
]

SIL_DEF = ["SIL"]

N_CLASSES = 41
BLANK_ID = 0
SIL_ID_MODEL = 40  # SIL position in model output order
SIL_ID_LM = 1      # SIL position in LM order


def rearrange_speech_logits(logits: np.ndarray) -> np.ndarray:
    """[..., BLANK, phones..., SIL] → [..., BLANK, SIL, phones...].

    Works for any leading shape; operates on the last axis
    (parity: evaluate_model_helpers.py:79-83).
    """
    return np.concatenate(
        (logits[..., 0:1], logits[..., -1:], logits[..., 1:-1]), axis=-1
    )


def greedy_collapse(ids: Sequence[int], blank: int = BLANK_ID) -> List[int]:
    """Collapse repeats then drop blanks (CTC greedy decoding rule)."""
    out: List[int] = []
    prev = None
    for i in ids:
        if i != prev:
            out.append(int(i))
        prev = i
    return [i for i in out if i != blank]


def logits_to_phonemes(logits: np.ndarray) -> List[str]:
    """Greedy argmax → collapse → phoneme strings in the *LM* channel order.

    Parity: general_utils.py:35-47 — note the double collapse (pre and post
    blank removal) in the reference, which we reproduce.
    """
    seq = np.argmax(logits, axis=1)
    seq2 = [int(seq[0])] + [int(seq[i]) for i in range(1, len(seq)) if seq[i] != seq[i - 1]]
    phones = [LOGIT_PHONE_DEF[i] for i in seq2]
    phones = [p for p in phones if p != "BLANK"]
    if not phones:
        return []
    return [phones[0]] + [phones[i] for i in range(1, len(phones)) if phones[i] != phones[i - 1]]


def remove_punctuation(sentence: str) -> str:
    """Normalize a sentence the way the eval pipeline does
    (evaluate_model_helpers.py:117-127)."""
    sentence = re.sub(r"[^a-zA-Z\- \']", "", sentence)
    sentence = sentence.replace("- ", " ").lower()
    sentence = sentence.replace("--", "").lower()
    sentence = sentence.replace(" '", "'").lower()
    sentence = sentence.strip()
    sentence = " ".join(w for w in sentence.split() if w != "")
    return sentence


def ids_to_phoneme_string(ids: Sequence[int], table: Sequence[str] = LOGIT_TO_PHONEME) -> str:
    return " ".join(table[i] for i in ids)
