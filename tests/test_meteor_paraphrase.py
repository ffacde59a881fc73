"""METEOR stage-4 paraphrase matching + en-task delta weighting
(mvc_tpu/evalcap/meteor.py _align_spans / _segment_stats_ex) vs a
brute-force span-matching oracle, plus behavior and backward-compat checks.

The reference runs meteor-1.5.jar with ``-a ./data/paraphrase-en.gz``
(reference pycocoevalcap/meteor/meteor.py:19-25): phrase-level paraphrase
matching is part of its METEOR capability.  The jar itself is a missing LFS
blob upstream, so the contract here is the published algorithm with
user-supplied tables, validated against exhaustive enumeration.
"""

import numpy as np
import pytest

from mvc_tpu.evalcap.meteor import (
    DELTA,
    FunctionWords,
    Meteor,
    ParaphraseTable,
    SynonymTable,
    _align,
    _align_spans,
    _candidate_pairs,
    _count_span_chunks,
    _paraphrase_candidates,
    _score_from_stats_ex,
    _segment_stats,
    _segment_stats_ex,
)


def _span_stats(matches):
    ms = sorted(matches)
    mh = sum(hl for _, hl, _, _, _ in ms)
    mr = sum(rl for _, _, _, rl, _ in ms)
    ds = sum(abs(hs - rs) for hs, _, rs, _, _ in ms)
    ws = sum(w * (hl + rl) / 2.0 for _, hl, _, rl, w in ms)
    return mh + mr, _count_span_chunks(ms), ds, ws


def _brute_force_spans(hyp, ref, syn=None, para=None):
    """Enumerate EVERY one-to-one span matching over the candidates; return
    the lexicographically best (max covered, min chunks, min dist, max
    weight) objective value."""
    word_cand = _candidate_pairs(hyp, ref, syn)
    cands = [[(1, j, 1, w) for j, w in row] for row in word_cand]
    if para is not None:
        for i, row in enumerate(_paraphrase_candidates(hyp, ref, para, word_cand)):
            cands[i].extend(row)
    best = None

    def rec(i, mask, picked):
        nonlocal best
        if i >= len(hyp):
            cov, ch, ds, ws = _span_stats(picked)
            key = (-cov, ch, ds, -ws)
            if best is None or key < best[0]:
                best = (key, (cov, ch, ds, ws))
            return
        rec(i + 1, mask, picked)
        for hl, rs, rl, w in cands[i]:
            span = ((1 << rl) - 1) << rs
            if mask & span:
                continue
            rec(i + hl, mask | span, picked + [(i, hl, rs, rl, w)])

    rec(0, 0, [])
    return best[1]


PARA = ParaphraseTable([
    ("soccer", "foot ball"),
    ("a little", "slightly"),
    ("kid", "child"),
    ("big dog", "large hound"),
])


def test_fuzz_spans_vs_bruteforce(rng):
    """150 fuzzed short pairs over a vocabulary dense in paraphrase-table
    phrases: the span beam search must reach the brute-force optimum."""
    words = ["soccer", "foot", "ball", "a", "little", "slightly", "kid",
             "child", "big", "dog", "large", "hound"]
    for _ in range(150):
        nh, nr = rng.integers(1, 6), rng.integers(1, 6)
        hyp = [words[k] for k in rng.integers(0, len(words), nh)]
        ref = [words[k] for k in rng.integers(0, len(words), nr)]
        bf = _brute_force_spans(hyp, ref, None, PARA)
        got = _span_stats(_align_spans(hyp, ref, None, PARA))
        assert got == bf, (hyp, ref, got, bf)


def test_span_aligner_matches_word_aligner_without_paraphrases(rng):
    """With para=None the span search must reduce exactly to the word-level
    search (same matches as 1x1 spans)."""
    syn = SynonymTable([["dog", "puppy"]])
    words = ["play", "playing", "dog", "puppy", "ball", "a"]
    for _ in range(100):
        nh, nr = rng.integers(1, 6), rng.integers(1, 6)
        hyp = [words[k] for k in rng.integers(0, len(words), nh)]
        ref = [words[k] for k in rng.integers(0, len(words), nr)]
        word = sorted(_align(hyp, ref, syn))
        span = sorted((hs, rs) for hs, hl, rs, rl, _ in _align_spans(hyp, ref, syn))
        assert span == word, (hyp, ref, span, word)


def test_multiword_paraphrase_matches():
    """'they played soccer' vs 'they played foot ball': the 1->2 span match
    covers the tail and yields one contiguous chunk."""
    hyp = "they played soccer".split()
    ref = "they played foot ball".split()
    matches = _align_spans(hyp, ref, None, PARA)
    assert (2, 1, 2, 2, 0.6) in matches           # soccer -> foot ball
    wh, wr, mh, mr, chunks, lhw, lrw, lh, lr = _segment_stats_ex(
        hyp, ref, None, PARA, None)
    assert (mh, mr) == (3, 4)                     # full cover, both sides
    assert chunks == 1
    assert wh == pytest.approx(2 * 1.0 + 0.6 * 1)     # exact,exact + para span
    assert wr == pytest.approx(2 * 1.0 + 0.6 * 2)
    # full double-sided cover in one chunk -> zero fragmentation penalty;
    # P = 2.6/3, R = 3.2/4 -> Fmean ~ 0.809 with pen = 0
    s = _score_from_stats_ex(wh, wr, mh, mr, chunks, lhw, lrw, lh, lr)
    assert s == pytest.approx(0.8094, abs=1e-3)


def test_stage_order_exact_beats_paraphrase():
    """A 1x1 pair matched by an earlier word stage must keep that stage's
    weight — 'kid' vs 'kid' is exact (1.0) even though ('kid','child') is in
    the paraphrase table."""
    wh, wr, *_ = _segment_stats_ex(["kid"], ["kid"], None, PARA, None)
    assert wh == wr == 1.0
    wh2, wr2, *_ = _segment_stats_ex(["kid"], ["child"], None, PARA, None)
    assert wh2 == wr2 == pytest.approx(0.6)       # paraphrase weight


def test_paraphrase_lifts_meteor_score():
    gts = {"v0": ["a man plays foot ball"]}
    res = {"v0": ["a man plays soccer"]}
    plain, _ = Meteor().compute_score(gts, res)
    para, _ = Meteor(paraphrases=PARA).compute_score(gts, res)
    assert para > plain


def test_function_word_delta_weighting():
    """With a function-word list, content words dominate P/R (delta=0.75):
    missing a content word must cost more than missing a function word."""
    fw = FunctionWords(["a", "the", "of"])
    gts = {"v0": ["the dog runs"]}
    miss_func = {"v0": ["dog runs"]}              # dropped function word
    miss_cont = {"v0": ["the runs"]}              # dropped content word
    s_func, _ = Meteor(function_words=fw).compute_score(gts, miss_func)
    s_cont, _ = Meteor(function_words=fw).compute_score(gts, miss_cont)
    assert s_func > s_cont
    # without the list both drops weigh the same word count
    p_func, _ = Meteor().compute_score(gts, miss_func)
    p_cont, _ = Meteor().compute_score(gts, miss_cont)
    assert p_func == pytest.approx(p_cont, rel=0.2)


def test_ex_stats_backward_compat(rng):
    """para=None fw=None: _segment_stats_ex must expand the word-level
    5-tuple exactly, and Meteor() scores are unchanged."""
    words = ["play", "dog", "ball", "a", "the"]
    for _ in range(50):
        nh, nr = rng.integers(1, 6), rng.integers(1, 6)
        hyp = [words[k] for k in rng.integers(0, len(words), nh)]
        ref = [words[k] for k in rng.integers(0, len(words), nr)]
        w, m, ch, lh, lr = _segment_stats(hyp, ref)
        ex = _segment_stats_ex(hyp, ref)
        assert ex == (w, w, m, m, ch, float(lh), float(lr), lh, lr)


def test_delta_constant():
    assert DELTA == 0.75


def test_paraphrase_table_loading(tmp_path):
    p = tmp_path / "para.txt"
    p.write_text("foot ball ||| soccer\nbig dog\tlarge hound\nmalformed line\n")
    t = ParaphraseTable.load(str(p))
    assert "soccer" in t.partners["foot ball"]
    assert "big dog" in t.partners["large hound"]
    assert t.max_len == 2
    f = tmp_path / "func.txt"
    f.write_text("a\nthe\n# comment\n\n")
    fw = FunctionWords.load(str(f))
    assert len(fw) == 2 and fw.cf("a") == pytest.approx(0.25)
    assert fw.cf("dog") == pytest.approx(0.75)


def test_native_span_aligner_matches_python_fuzz(rng):
    """C++ meteor_align_spans must reproduce the Python span search's
    score-relevant stats on fuzzed inputs (and its exact matches under the
    deterministic tie-break order)."""
    from mvc_tpu.evalcap.meteor import STAGE_WEIGHTS, _paraphrase_candidates
    from mvc_tpu.evalcap.stemmer import porter_stem

    try:
        from mvc_tpu import _native
    except ImportError:
        pytest.skip("native extension not built")
    if not hasattr(_native, "meteor_align_spans"):
        pytest.skip("stale native extension (run `make native`)")

    syn = SynonymTable([["dog", "hound"]])
    words = ["soccer", "foot", "ball", "a", "little", "slightly", "kid",
             "child", "big", "dog", "large", "hound", "play", "playing"]
    for _ in range(200):
        nh, nr = rng.integers(1, 7), rng.integers(1, 7)
        hyp = [words[k] for k in rng.integers(0, len(words), nh)]
        ref = [words[k] for k in rng.integers(0, len(words), nr)]
        py = _align_spans(hyp, ref, syn, PARA)
        word_cand = _candidate_pairs(hyp, ref, syn)
        spans = [[(hl, rs, rl, w) for hl, rs, rl, w in row]
                 for row in _paraphrase_candidates(hyp, ref, PARA, word_cand)]
        cc = _native.meteor_align_spans(
            hyp, ref, [porter_stem(w) for w in hyp],
            [porter_stem(w) for w in ref],
            STAGE_WEIGHTS[0], STAGE_WEIGHTS[1],
            [sorted(syn.ids(w)) for w in hyp],
            [sorted(syn.ids(w)) for w in ref],
            STAGE_WEIGHTS[2], spans)
        assert sorted(cc) == sorted(py), (hyp, ref, cc, py)
