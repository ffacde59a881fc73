"""Native METEOR scorer (Denkowski & Lavie 2011/2014 formulation).

The reference shells out to ``meteor-1.5.jar`` over a stdio line protocol
(reference pycocoevalcap/meteor/meteor.py:19-48) — and that jar is a missing
git-LFS blob even in the reference repo, so its METEOR path cannot actually
run.  This is a from-scratch implementation of the published algorithm:

- matcher stages: exact match, Porter-stem match, and — when a user-supplied
  synonym table is provided — a synonym stage (meteor-1.5 runs WordNet
  synonymy as its stage 3; the WordNet / paraphrase-en.gz data is not
  redistributable here, so the table is user-supplied: a text file with one
  synonym group per line, words whitespace-separated)
- alignment: per stage, position-monotone-preferring assignment resolved to
  minimize crossing matches, then chunk counting over the merged alignment
- scoring (English task defaults): alpha=0.85, beta=0.2, gamma=0.6,
  stage weights exact=1.0, stem=0.6, synonym=0.8 (meteor-1.5 ``-l en``)
      P = sum(w_i * m_i) / len(hyp),  R = sum(w_i * m_i) / len(ref)
      Fmean = P * R / (alpha * P + (1 - alpha) * R)
      Pen = gamma * (chunks / matches) ** beta
      score = (1 - Pen) * Fmean
- multiple references: the best-scoring reference wins (per METEOR)
- corpus score: computed from summed segment statistics, like the jar's
  final EVAL line (not a plain mean of segment scores)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Set, Tuple, Union

from mvc_tpu.evalcap.stemmer import porter_stem

ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
STAGE_WEIGHTS = (1.0, 0.6, 0.8)  # exact, stem, synonym (meteor-1.5 en)

try:  # C++ aligner (csrc/native.cpp); Python fallback below is identical
    from mvc_tpu import _native as _native_mod
except ImportError:
    _native_mod = None

_native_probed: bool = False


def _native_usable() -> bool:
    """One-time arity probe: a stale .so predating the synonym stage accepts
    only 6 args — degrade to the identical pure-Python aligner (with a
    warning) instead of failing every METEOR call.  Probing once up front
    means real argument-validation TypeErrors from the extension still
    propagate from actual scoring calls."""
    global _native_mod, _native_probed
    if _native_mod is None:
        return False
    if not _native_probed:
        _native_probed = True
        try:
            _native_mod.meteor_stats([], [], [], [], 1.0, 0.6, None, None, 0.8)
        except TypeError:
            import warnings

            warnings.warn("stale mvc_tpu._native extension (run `make native`); "
                          "using the pure-Python METEOR aligner", RuntimeWarning)
            _native_mod = None
            return False
    return True


class SynonymTable:
    """Word -> synonym-group-ids mapping.  Two words synonym-match when they
    share a group (mirrors meteor-1.5's WordNet synset-overlap test).

    Built from ``{word: groups}`` dicts, an iterable of word groups, or a
    text file with one whitespace-separated synonym group per line."""

    def __init__(self, groups):
        self.word_groups: Dict[str, Set[int]] = {}
        for gid, group in enumerate(groups):
            for w in group:
                self.word_groups.setdefault(w, set()).add(gid)

    @classmethod
    def load(cls, path: str) -> "SynonymTable":
        groups = []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                words = line.split()
                if len(words) >= 2:
                    groups.append([w.lower() for w in words])
        return cls(groups)

    def ids(self, word: str) -> Set[int]:
        return self.word_groups.get(word, set())

    def __len__(self) -> int:
        return len(self.word_groups)


def _resolve_synonyms(
    synonyms: Union[None, str, SynonymTable, Sequence[Sequence[str]]]
) -> Optional[SynonymTable]:
    if synonyms is None:
        return None
    if isinstance(synonyms, SynonymTable):
        return synonyms
    if isinstance(synonyms, (str, os.PathLike)):
        return SynonymTable.load(str(synonyms))
    return SynonymTable(synonyms)


def _align(
    hyp: Sequence[str], ref: Sequence[str], syn: Optional[SynonymTable] = None
) -> List[Tuple[int, int]]:
    """Greedy staged alignment.  Returns (hyp_idx, ref_idx) pairs, at most one
    match per word on each side.  Within a stage, each hyp word prefers the
    closest unmatched ref occurrence (minimizes crossings for the common
    caption case)."""
    matches: List[Tuple[int, int]] = []
    hyp_used = [False] * len(hyp)
    ref_used = [False] * len(ref)

    def run_stage(hyp_keys: List[str], ref_keys: List[str]):
        for i, hk in enumerate(hyp_keys):
            if hyp_used[i]:
                continue
            best_j, best_d = -1, None
            for j, rk in enumerate(ref_keys):
                if ref_used[j] or hk != rk:
                    continue
                d = abs(i - j)
                if best_d is None or d < best_d:
                    best_j, best_d = j, d
            if best_j >= 0:
                hyp_used[i] = True
                ref_used[best_j] = True
                matches.append((i, best_j))

    def run_synonym_stage(hyp_ids: List[Set[int]], ref_ids: List[Set[int]]):
        for i, hi in enumerate(hyp_ids):
            if hyp_used[i] or not hi:
                continue
            best_j, best_d = -1, None
            for j, rj in enumerate(ref_ids):
                if ref_used[j] or not (hi & rj):
                    continue
                d = abs(i - j)
                if best_d is None or d < best_d:
                    best_j, best_d = j, d
            if best_j >= 0:
                hyp_used[i] = True
                ref_used[best_j] = True
                matches.append((i, best_j))

    run_stage(list(hyp), list(ref))
    run_stage([porter_stem(w) for w in hyp], [porter_stem(w) for w in ref])
    if syn is not None:
        run_synonym_stage([syn.ids(w) for w in hyp], [syn.ids(w) for w in ref])
    return sorted(matches)


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    """Number of maximal runs contiguous in both hypothesis and reference."""
    if not matches:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def _match_weight(hw: str, rw: str) -> float:
    """Stage weight of a matched pair, inferred in stage order: exact (1.0),
    stem (0.6), else it came from the synonym stage (0.8)."""
    if hw == rw:
        return STAGE_WEIGHTS[0]
    if porter_stem(hw) == porter_stem(rw):
        return STAGE_WEIGHTS[1]
    return STAGE_WEIGHTS[2]


def _segment_stats(
    hyp: Sequence[str], ref: Sequence[str], syn: Optional[SynonymTable] = None
):
    """(weighted_matches, total_matches, chunks, len_hyp, len_ref)."""
    if _native_usable():
        hyp_syn = [sorted(syn.ids(w)) for w in hyp] if syn is not None else None
        ref_syn = [sorted(syn.ids(w)) for w in ref] if syn is not None else None
        weighted, m, chunks = _native_mod.meteor_stats(
            list(hyp), list(ref),
            [porter_stem(w) for w in hyp], [porter_stem(w) for w in ref],
            STAGE_WEIGHTS[0], STAGE_WEIGHTS[1],
            hyp_syn, ref_syn, STAGE_WEIGHTS[2],
        )
        return weighted, m, chunks, len(hyp), len(ref)
    matches = _align(hyp, ref, syn)
    weighted = sum(_match_weight(hyp[i], ref[j]) for i, j in matches)
    return weighted, len(matches), _count_chunks(matches), len(hyp), len(ref)


def _score_from_stats(weighted, m, chunks, lh, lr) -> float:
    if m == 0 or lh == 0 or lr == 0:
        return 0.0
    p = weighted / lh
    r = weighted / lr
    if p == 0 or r == 0:
        return 0.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    pen = GAMMA * (chunks / m) ** BETA if m > 0 else 0.0
    # Identical strings form a single chunk pair; the canonical tool zeroes
    # the penalty when everything matches in one chunk.
    if chunks == 1 and m == lh == lr:
        pen = 0.0
    return (1.0 - pen) * fmean


class Meteor:
    def __init__(self, synonyms=None):
        """``synonyms``: None, a SynonymTable, a path to a one-group-per-line
        text file, or an iterable of word groups.  When set, enables the
        meteor-1.5 synonym stage (stage 3, weight 0.8)."""
        self.synonyms = _resolve_synonyms(synonyms)

    def compute_score(self, gts: Dict[str, List[str]], res: Dict[str, List[str]]):
        assert sorted(gts.keys()) == sorted(res.keys())
        import numpy as np

        ids = sorted(gts.keys())
        scores: List[float] = []
        agg = [0.0, 0, 0, 0, 0]
        for img in ids:
            hyp = res[img][0].split()
            best_score, best_stats = 0.0, (0.0, 0, 0, len(hyp), 0)
            for ref_s in gts[img]:
                ref = ref_s.split()
                stats = _segment_stats(hyp, ref, self.synonyms)
                s = _score_from_stats(*stats)
                if s >= best_score:
                    best_score, best_stats = s, stats
            scores.append(best_score)
            agg = [a + b for a, b in zip(agg, best_stats)]

        corpus = _score_from_stats(*agg)
        return corpus, np.array(scores)

    def method(self) -> str:
        return "METEOR"
