"""WordNet WNDB converter (scripts/build_wordnet_tables.py) + the SPICE
lexicon's Morphy-style lemmatization fallback.  Uses a tiny synthetic WNDB
fixture (wndb(5WN) line formats) — real WordNet data is not redistributable
from this environment."""

import subprocess
import sys

import pytest

from mvc_tpu.evalcap.meteor import SynonymTable
from mvc_tpu.evalcap.spice import PosLexicon, parse_scene_graph

# wndb(5WN): data.<pos> = "offset lex_filenum ss_type w_cnt(word lex_id)+ ..."
DATA_NOUN = """\
  1 this software and database is a fake license header line
00001740 03 n 02 dog 0 domestic_dog 0 001 @ 00001930 n 0000 | a member of the genus Canis
00002137 03 n 03 puppy 0 pup 0 whelp 0 000 | a young dog
00003000 03 n 01 guitar 0 000 | a stringed instrument
"""
DATA_VERB = """\
00010000 29 v 02 run 0 go 1 000 | move fast
00020000 29 v 01 play 0 000 | engage in an activity
"""
INDEX_NOUN = """\
  1 fake license header
dog n 1 1 @ 1 4 00001740
puppy n 1 0 1 2 00002137
guitar n 1 0 1 1 00003000
play n 1 0 1 1 00099999
"""
INDEX_VERB = """\
run v 1 0 1 7 00010000
play v 1 0 1 9 00020000
"""
NOUN_EXC = "men man\nchildren child\n"
VERB_EXC = "ran run\nwent go\n"


@pytest.fixture()
def wndb(tmp_path):
    d = tmp_path / "dict"
    d.mkdir()
    (d / "data.noun").write_text(DATA_NOUN)
    (d / "data.verb").write_text(DATA_VERB)
    (d / "index.noun").write_text(INDEX_NOUN)
    (d / "index.verb").write_text(INDEX_VERB)
    (d / "noun.exc").write_text(NOUN_EXC)
    (d / "verb.exc").write_text(VERB_EXC)
    return d


def test_converter_outputs(wndb, tmp_path):
    syn_p = tmp_path / "syn.txt"
    lex_p = tmp_path / "lex.txt"
    out = subprocess.run(
        [sys.executable, "scripts/build_wordnet_tables.py", "--wndb", str(wndb),
         "--synonyms-out", str(syn_p), "--lexicon-out", str(lex_p)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr

    # synonyms: multiword "domestic_dog" dropped; single-member groups dropped
    groups = [set(l.split()) for l in syn_p.read_text().splitlines()]
    assert {"puppy", "pup", "whelp"} in groups
    assert {"run", "go"} in groups
    assert not any("domestic_dog" in g for g in groups)
    assert not any(g == {"guitar"} for g in groups)

    syn = SynonymTable.load(str(syn_p))
    assert syn.ids("puppy") & syn.ids("whelp")

    # lexicon: POS ordered by tagsense count (play: verb 9 > noun 1);
    # irregular forms from *.exc carry their base lemma
    lex = PosLexicon.load(str(lex_p))
    assert lex.lookup("play") == (("verb", "noun"), "play")
    assert lex.lookup("dog") == (("noun",), "dog")
    assert lex.lookup("men") == (("noun",), "man")
    assert lex.lookup("ran") == (("verb",), "run")


def test_morphy_fallback_regular_inflections(wndb, tmp_path):
    lex_p = tmp_path / "lex.txt"
    subprocess.run(
        [sys.executable, "scripts/build_wordnet_tables.py", "--wndb", str(wndb),
         "--lexicon-out", str(lex_p)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120, check=True,
    )
    lex = PosLexicon.load(str(lex_p))
    # regular inflections resolve through Morphy detachment, not the noun default
    assert lex.lookup("dogs") == (("noun",), "dog")
    assert lex.lookup("playing") == (("verb",), "play")
    assert lex.lookup("running") == (("verb",), "run")   # doubled consonant
    assert lex.lookup("guitars") == (("noun",), "guitar")
    # unknown stays the noun default
    assert lex.lookup("zzzq") == (("noun",), "zzzq")


def test_generated_tables_drive_the_metrics(wndb, tmp_path):
    lex_p = tmp_path / "lex.txt"
    subprocess.run(
        [sys.executable, "scripts/build_wordnet_tables.py", "--wndb", str(wndb),
         "--lexicon-out", str(lex_p)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120, check=True,
    )
    lex = PosLexicon.load(str(lex_p))
    g = parse_scene_graph("a man is playing a guitar", lex)
    # "man" resolves via the noun.exc-driven... no: "man" itself isn't in the
    # fixture index; it falls back to the noun default — still a valid object
    assert ("man", "play", "guitar") in g
