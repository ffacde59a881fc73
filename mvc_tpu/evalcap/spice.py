"""SPICE stub.

The reference vendors a SPICE wrapper but never uses it: it is commented out
of the eval harness (reference pycocoevalcap/eval.py:44) and absent from
NLPScore (src/losses.py:146-151), and its jar is a missing LFS blob.  This
stub keeps the API surface; calling it raises with a clear message."""

from __future__ import annotations

from typing import Dict, List


class Spice:
    def compute_score(self, gts: Dict[str, List[str]], res: Dict[str, List[str]]):
        raise NotImplementedError(
            "SPICE requires the Stanford scene-graph parser (a Java artifact "
            "that is a missing blob even in the reference repo and is unused "
            "by its scoring path). BLEU/METEOR/ROUGE-L/CIDEr are implemented."
        )

    def method(self) -> str:
        return "SPICE"
