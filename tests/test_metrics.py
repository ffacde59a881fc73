"""Metrics-engine parity against the reference's vendored pycocoevalcap
(imported read-only from /root/reference as the oracle — pure-Python BLEU /
ROUGE / CIDEr).  METEOR has no runnable oracle (the reference's jar is a
missing LFS blob), so it gets property tests."""

import os
import sys

import numpy as np
import pytest

from mvc_tpu.evalcap import Bleu, Cider, Meteor, Rouge, NLPScore, COCOEvalCap
from mvc_tpu.evalcap.stemmer import porter_stem
from mvc_tpu.evalcap.tokenizer import ptb_tokenize_line

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "pycocoevalcap"))
if HAS_REFERENCE and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

GTS = {
    "vid1": ["a man is playing a guitar", "a man plays the guitar", "someone plays music"],
    "vid2": ["a woman is cooking food in a kitchen", "a woman cooks a meal"],
    "vid3": ["a dog runs in the park", "the dog is running across a field"],
    "vid4": ["two men ride bikes down the street"],
    "vid5": ["children are playing in the water", "kids play with water"],
}
RES = {
    "vid1": ["a man is playing the guitar"],
    "vid2": ["a woman is cooking in a kitchen"],
    "vid3": ["a dog is running"],
    "vid4": ["a man rides a bike"],
    "vid5": ["children play in water"],
}


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference oracle unavailable")
def test_bleu_matches_reference_oracle():
    from pycocoevalcap.bleu.bleu import Bleu as RefBleu

    ours, ours_per = Bleu(4).compute_score(GTS, RES)
    ref, ref_per = RefBleu(4).compute_score(GTS, RES)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
    for k in range(4):
        np.testing.assert_allclose(ours_per[k], ref_per[k], rtol=1e-12)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference oracle unavailable")
def test_rouge_matches_reference_oracle():
    from pycocoevalcap.rouge.rouge import Rouge as RefRouge

    ours, ours_per = Rouge().compute_score(GTS, RES)
    ref, ref_per = RefRouge().compute_score(GTS, RES)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
    np.testing.assert_allclose(ours_per, ref_per, rtol=1e-12)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference oracle unavailable")
def test_cider_matches_reference_oracle():
    from pycocoevalcap.cider.cider import Cider as RefCider

    ours, ours_per = Cider().compute_score(GTS, RES)
    ref, ref_per = RefCider().compute_score(GTS, RES)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)
    np.testing.assert_allclose(ours_per, ref_per, rtol=1e-10)


def test_bleu_perfect_match():
    gts = {"a": ["the cat sat on the mat"]}
    res = {"a": ["the cat sat on the mat"]}
    scores, _ = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(scores, [1.0] * 4, atol=1e-6)


def test_rouge_bounds():
    score, per = Rouge().compute_score(GTS, RES)
    assert 0.0 < score < 1.0
    assert np.all((per >= 0) & (per <= 1))


def test_cider_identity_beats_mismatch():
    gts = {"a": ["a man plays guitar"], "b": ["a dog runs fast"]}
    res_good = {"a": ["a man plays guitar"], "b": ["a dog runs fast"]}
    res_bad = {"a": ["purple elephants fly"], "b": ["quantum mechanics lecture"]}
    good, _ = Cider().compute_score(gts, res_good)
    bad, _ = Cider().compute_score(gts, res_bad)
    assert good > bad
    assert bad == 0.0


def test_meteor_properties():
    m = Meteor()
    # perfect match scores high (penalty zeroed for full single-chunk match)
    s_perfect, per = m.compute_score(
        {"a": ["the cat sat on the mat"]}, {"a": ["the cat sat on the mat"]}
    )
    assert s_perfect > 0.99
    # disjoint scores zero
    s_zero, _ = m.compute_score({"a": ["dog runs fast"]}, {"a": ["purple elephant"]})
    assert s_zero == 0.0
    # stem matches count, at lower weight than exact
    s_stem, _ = m.compute_score({"a": ["the dog runs"]}, {"a": ["the dog running"]})
    s_exact, _ = m.compute_score({"a": ["the dog runs"]}, {"a": ["the dog runs"]})
    assert 0 < s_stem < s_exact
    # word order affects the fragmentation penalty
    s_shuffled, _ = m.compute_score(
        {"a": ["the cat sat on the mat"]}, {"a": ["mat the on sat cat the"]}
    )
    assert s_shuffled < s_perfect


def test_porter_stemmer():
    assert porter_stem("running") == "run"
    assert porter_stem("cats") == "cat"
    assert porter_stem("played") == porter_stem("playing") == "plai"
    assert porter_stem("relational") == "relat"
    assert porter_stem("conditional") == "condit"
    assert porter_stem("sky") == "sky"


def test_ptb_tokenizer():
    assert ptb_tokenize_line("A man, playing (guitar)!") == ["a", "man", "playing", "guitar"]
    assert ptb_tokenize_line("don't stop...") == ["do", "n't", "stop"]
    assert ptb_tokenize_line("it's 3.5 meters") == ["it", "'s", "3.5", "meters"]


def test_nlp_score_keys():
    scores = NLPScore(GTS, RES)
    assert set(scores.keys()) == {
        "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"
    }
    assert all(np.isfinite(v) for v in scores.values())


def test_coco_eval_cap():
    e = COCOEvalCap(GTS, RES)
    out = e.evaluate()
    assert "CIDEr" in out and "Bleu_4" in out
    assert set(e.imgToEval.keys()) == set(GTS.keys())


def test_meteor_synonym_table(tmp_path):
    """A user-supplied synonym table enables METEOR stage 3 (weight 0.8) and
    changes scores exactly as the match-weight math predicts."""
    from mvc_tpu.evalcap.meteor import ALPHA, Meteor, SynonymTable

    gts = {"v0": ["a man plays a guitar"]}
    res = {"v0": ["a guy plays a guitar"]}

    base, _ = Meteor().compute_score(gts, res)
    syn, _ = Meteor(synonyms=[["man", "guy"]]).compute_score(gts, res)
    assert syn > base

    # exact expectation: 5 words, 4 exact (w 1.0) + 1 synonym (w 0.8) = 4.8
    # matched contiguously -> 1 chunk + full-match-short-circuit doesn't apply
    # (m == lh == lr but chunks... all 5 matched, single chunk? matches are
    # (0,0),(1,1),(2,2),(3,3),(4,4) -> 1 chunk and m==lh==lr -> pen zeroed)
    p = r = 4.8 / 5
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    assert syn == pytest.approx(fmean)

    # file loading: one group per line
    f = tmp_path / "syn.txt"
    f.write_text("man guy fellow\nguitar axe\n")
    t = SynonymTable.load(str(f))
    assert t.ids("man") == t.ids("guy") == t.ids("fellow")
    assert t.ids("guitar") and t.ids("guitar") == t.ids("axe")
    assert not (t.ids("man") & t.ids("guitar"))
    from_file, _ = Meteor(synonyms=str(f)).compute_score(gts, res)
    assert from_file == pytest.approx(syn)

    # NLPScore plumbing
    from mvc_tpu.evalcap import NLPScore
    s0 = NLPScore(gts, res)
    s1 = NLPScore(gts, res, meteor_synonyms=str(f))
    assert s1["METEOR"] > s0["METEOR"]
    assert s1["CIDEr"] == pytest.approx(s0["CIDEr"])  # other metrics untouched
