"""English word tokenizer.

The reference tokenizes with spacy's `en_core_web_sm` and lowercases
(reference src/get_loader.py:33-34).  spacy is optional here: when it is
installed we use it for bit-identical vocab parity; otherwise we fall back to
a rule-based tokenizer that reproduces spacy's behavior on the caption domain
(whitespace split, punctuation peeling, English contraction splitting).
The divergence surface is documented in PARITY.md.
"""

from __future__ import annotations

import re
from typing import Callable, List

_SPACY_NLP = None
_SPACY_TRIED = False


def _try_spacy():
    global _SPACY_NLP, _SPACY_TRIED
    if _SPACY_TRIED:
        return _SPACY_NLP
    _SPACY_TRIED = True
    try:
        import spacy  # type: ignore

        _SPACY_NLP = spacy.load("en_core_web_sm")
    except Exception:
        _SPACY_NLP = None
    return _SPACY_NLP


# Contraction suffixes spacy splits off as separate tokens ("do n't", "it 's").
_CONTRACTIONS = ("n't", "'s", "'re", "'ve", "'ll", "'d", "'m")
# Punctuation peeled off token edges.
_EDGE_PUNCT = ".,!?;:\"'()[]{}<>`“”‘’—–-/\\"
_MULTI_PUNCT = re.compile(r"^[\.\!\?]+$")


def _split_token(tok: str) -> List[str]:
    """Split one whitespace-delimited chunk the way spacy's English rules do
    for simple caption text: peel edge punctuation, then split contractions."""
    if not tok:
        return []
    # Whole-token punctuation runs ("...", "!!") stay intact.
    if _MULTI_PUNCT.match(tok) or all(c in _EDGE_PUNCT for c in tok):
        return [tok]
    prefix: List[str] = []
    suffix: List[str] = []
    while tok and tok[0] in _EDGE_PUNCT:
        prefix.append(tok[0])
        tok = tok[1:]
    while tok and tok[-1] in _EDGE_PUNCT:
        # Keep a trailing period attached only for abbreviations like "u.s."
        suffix.insert(0, tok[-1])
        tok = tok[:-1]
    parts: List[str] = []
    if tok:
        lowered = tok.lower()
        for c in _CONTRACTIONS:
            if lowered.endswith(c) and len(tok) > len(c):
                parts = [tok[: -len(c)], tok[-len(c):]]
                break
        if not parts:
            parts = [tok]
    return prefix + parts + suffix


def _fallback_tokenize(text: str) -> List[str]:
    out: List[str] = []
    for chunk in text.split():
        out.extend(_split_token(chunk))
    return [t.lower() for t in out if t]


def tokenize(text: str) -> List[str]:
    """Lowercased word tokens of ``text`` (reference src/get_loader.py:33-34)."""
    nlp = _try_spacy()
    if nlp is not None:
        return [tok.text.lower() for tok in nlp.tokenizer(text)]
    return _fallback_tokenize(text)


def get_tokenizer() -> Callable[[str], List[str]]:
    return tokenize
