"""The METEOR alignment search vs a brute-force optimal-alignment oracle.

VERDICT r2 flagged the previous greedy closest-occurrence aligner: meteor-1.5
performs a search that maximizes matches and then minimizes chunks, and on
sentences with repeated words the greedy pass can produce a different chunk
count -> different fragmentation penalty -> different score.  These tests
validate the replacement (mvc_tpu/evalcap/meteor.py _align + the C++
meteor_stats in csrc/native.cpp) against exhaustive enumeration of every
one-to-one matching on short sentences, plus repeated-word adversarial cases
where greedy was provably wrong."""

import itertools

import numpy as np
import pytest

from mvc_tpu.evalcap.meteor import (
    STAGE_WEIGHTS,
    SynonymTable,
    _align,
    _count_chunks,
    _candidate_pairs,
    _match_weight,
    _segment_stats,
)
from mvc_tpu.evalcap.stemmer import porter_stem


def _stats_of(matches, hyp, ref):
    matches = sorted(matches)
    weighted = sum(_match_weight(hyp[i], ref[j]) for i, j in matches)
    dist = sum(abs(i - j) for i, j in matches)
    return len(matches), _count_chunks(matches), dist, weighted


def _brute_force(hyp, ref, syn=None):
    """Enumerate EVERY one-to-one matching over the candidate pairs; return
    the (matches, chunks, dist, weighted) of the lexicographically best
    (max matches, min chunks, min dist, max weighted) — the search's
    objective."""
    cand = _candidate_pairs(hyp, ref, syn)
    best = None

    def rec(i, used, picked):
        nonlocal best
        if i == len(hyp):
            mt, ch, ds, wt = _stats_of(picked, hyp, ref)
            key = (-mt, ch, ds, -wt)
            if best is None or key < best[0]:
                best = (key, (mt, ch, ds, wt))
            return
        rec(i + 1, used, picked)                      # hyp[i] unmatched
        for j, _w in cand[i]:
            if j not in used:
                rec(i + 1, used | {j}, picked + [(i, j)])

    rec(0, frozenset(), [])
    return best[1]


def _search_stats(hyp, ref, syn=None):
    matches = _align(hyp, ref, syn)
    return _stats_of(matches, hyp, ref)


VOCAB = ["a", "b", "c", "a", "b"]          # repeats on purpose


def test_fuzz_vs_bruteforce_exact_stage(rng):
    """200 fuzzed short sentence pairs from a 3-word alphabet (dense with
    repeats): the beam search must reach the brute-force optimum's stats."""
    for _ in range(200):
        nh, nr = rng.integers(1, 7), rng.integers(1, 7)
        hyp = [VOCAB[k] for k in rng.integers(0, 3, nh)]
        ref = [VOCAB[k] for k in rng.integers(0, 3, nr)]
        bf = _brute_force(hyp, ref)
        got = _search_stats(hyp, ref)
        # dist is a tie-break, not score-relevant; require score-relevant
        # stats AND the full lexicographic objective value to match
        assert got == bf, (hyp, ref, got, bf)


def test_fuzz_vs_bruteforce_with_stems_and_synonyms(rng):
    """Mixed stages: words that stem-match ('play'/'playing') and a synonym
    table ('dog'~'puppy') — the candidate-pair weights must survive the
    search identically to brute force."""
    syn = SynonymTable([["dog", "puppy"], ["kid", "child"]])
    words = ["play", "playing", "played", "dog", "puppy", "kid", "child", "ball"]
    for _ in range(150):
        nh, nr = rng.integers(1, 6), rng.integers(1, 6)
        hyp = [words[k] for k in rng.integers(0, len(words), nh)]
        ref = [words[k] for k in rng.integers(0, len(words), nr)]
        bf = _brute_force(hyp, ref, syn)
        got = _search_stats(hyp, ref, syn)
        assert got == bf, (hyp, ref, got, bf)


def test_repeated_word_adversarial_beats_greedy():
    """hyp='a b a', ref='a a b': greedy closest-occurrence picks
    (0,0),(1,2),(2,1) -> 3 chunks; the optimal matching (0,1),(1,2),(2,0)
    keeps (0,1)(1,2) contiguous -> 2 chunks and a lower penalty."""
    hyp, ref = ["a", "b", "a"], ["a", "a", "b"]
    mt, ch, ds, wt = _search_stats(hyp, ref)
    assert (mt, ch) == (3, 2)
    assert _brute_force(hyp, ref) == (mt, ch, ds, wt)


def test_max_matches_preferred_over_chunkiness():
    """The search must never drop a match to reduce chunks: 'a b' vs 'b a'
    has a 2-match 2-chunk alignment that beats any 1-match 1-chunk one."""
    mt, ch, _, _ = _search_stats(["a", "b"], ["b", "a"])
    assert (mt, ch) == (2, 2)


def test_native_matches_python_fuzz(rng):
    """C++ meteor_stats must be bit-identical to the Python search on fuzzed
    sentences (same beam, same total-order tie-breaks)."""
    pytest.importorskip("mvc_tpu._native")
    from mvc_tpu import _native

    syn = SynonymTable([["dog", "puppy"], ["run", "sprint"]])
    words = ["a", "b", "dog", "puppy", "run", "running", "sprint", "cat"]
    for _ in range(300):
        nh, nr = rng.integers(1, 10), rng.integers(1, 10)
        hyp = [words[k] for k in rng.integers(0, len(words), nh)]
        ref = [words[k] for k in rng.integers(0, len(words), nr)]
        matches = _align(hyp, ref, syn)
        py = (sum(_match_weight(hyp[i], ref[j]) for i, j in matches),
              len(matches), _count_chunks(sorted(matches)))
        cc = _native.meteor_stats(
            hyp, ref,
            [porter_stem(w) for w in hyp], [porter_stem(w) for w in ref],
            STAGE_WEIGHTS[0], STAGE_WEIGHTS[1],
            [sorted(syn.ids(w)) for w in hyp],
            [sorted(syn.ids(w)) for w in ref],
            STAGE_WEIGHTS[2],
        )
        assert cc[1] == py[1] and cc[2] == py[2], (hyp, ref, cc, py)
        np.testing.assert_allclose(cc[0], py[0], rtol=0, atol=1e-9)


def test_segment_stats_routes_long_refs_to_python():
    """>64-word references exceed the C++ mask width and must fall back to
    the Python aligner rather than erroring."""
    hyp = ["a", "b"]
    ref = ["a"] * 70
    weighted, m, chunks, lh, lr = _segment_stats(hyp, ref)
    assert (m, lh, lr) == (1, 2, 70) and weighted == 1.0 and chunks == 1


def test_native_rejects_over_width_refs():
    pytest.importorskip("mvc_tpu._native")
    from mvc_tpu import _native

    with pytest.raises(ValueError):
        _native.meteor_stats(["a"], ["a"] * 65, ["a"], ["a"] * 65)
