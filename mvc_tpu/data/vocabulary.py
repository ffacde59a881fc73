"""Word <-> index vocabulary with the reference's exact semantics
(reference src/get_loader.py:23-114):

- specials ``<PAD>=0, <SOS>=1, <EOS>=2, <UNK>=3``
- words admitted in first-reached-threshold order (a word enters the vocab the
  moment its running count hits ``freq_threshold``), which makes the id
  assignment order-dependent — replicated exactly
- ``numericalize`` maps OOV to ``<UNK>``
- ``apply_vocab`` rewrites OOV tokens to the literal string ``"<UNK>"`` for
  ground-truth reference captions
- ``decode_indexes`` stops at the first ``<EOS>``

Persistence uses JSON (portable, no pickle-of-class coupling); ``load`` also
accepts the reference's pickled Vocabulary files for parity testing.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Iterable, List, Sequence

from mvc_tpu.config import EOS_ID, PAD_ID, SOS_ID, UNK_ID
from mvc_tpu.data.tokenizer import tokenize

_SPECIALS = {PAD_ID: "<PAD>", SOS_ID: "<SOS>", EOS_ID: "<EOS>", UNK_ID: "<UNK>"}


class Vocabulary:
    def __init__(self, freq_threshold: int = 5):
        self.itos: Dict[int, str] = dict(_SPECIALS)
        self.stoi: Dict[str, int] = {w: i for i, w in _SPECIALS.items()}
        self.freq_threshold = freq_threshold

    def __len__(self) -> int:
        return len(self.itos)

    @staticmethod
    def tokenizer_eng(text: str) -> List[str]:
        return tokenize(text)

    def build_vocabulary(self, sentence_list: Iterable[str]) -> None:
        """Streaming frequency-threshold build.  A word is assigned the next
        id the moment its count reaches the threshold — the admission *order*
        matters and is replicated (reference src/get_loader.py:36-50)."""
        frequencies: Dict[str, int] = {}
        idx = len(_SPECIALS)
        for sentence in sentence_list:
            for word in self.tokenizer_eng(sentence):
                frequencies[word] = frequencies.get(word, 0) + 1
                if frequencies[word] == self.freq_threshold:
                    self.stoi[word] = idx
                    self.itos[idx] = word
                    idx += 1

    def numericalize(self, text: str) -> List[int]:
        return [self.stoi.get(tok, UNK_ID) for tok in self.tokenizer_eng(text)]

    def encode_caption(self, text: str) -> List[int]:
        """<SOS> + tokens + <EOS> (reference src/get_loader.py:238-240)."""
        return [SOS_ID, *self.numericalize(text), EOS_ID]

    def apply_vocab(self, sentence: str) -> str:
        toks = [t if t in self.stoi else "<UNK>" for t in self.tokenizer_eng(sentence)]
        return " ".join(toks)

    def decode_indexes(self, indexes: Sequence[int]) -> str:
        words: List[str] = []
        for idx in indexes:
            idx = int(idx)
            if idx == EOS_ID:
                break
            words.append(self.itos[idx])
        return " ".join(words)

    # ------------------------------------------------------------------ io
    def save(self, path: str) -> None:
        payload = {
            "freq_threshold": self.freq_threshold,
            "itos": {str(k): v for k, v in self.itos.items()},
        }
        with open(path, "w") as f:
            json.dump(payload, f)

    # Alias matching the reference API name (src/get_loader.py:63-65).
    save_vocab = save

    @staticmethod
    def prebuild(sentence_list: Iterable[str], outpath: str, freq_threshold: int = 5) -> "Vocabulary":
        vocab = Vocabulary(freq_threshold)
        vocab.build_vocabulary(sentence_list)
        vocab.save(outpath)
        return vocab

    @staticmethod
    def load(path: str) -> "Vocabulary":
        """Load a vocabulary.  Accepts our JSON format or the reference's
        pickled Vocabulary (reference src/get_loader.py:63-69) so reference
        checkpoints can be scored for parity."""
        with open(path, "rb") as f:
            head = f.read(2)
        if head[:1] == b"{":
            with open(path, "r") as f:
                payload = json.load(f)
            vocab = Vocabulary(payload.get("freq_threshold", 5))
            vocab.itos = {int(k): v for k, v in payload["itos"].items()}
            vocab.stoi = {v: k for k, v in vocab.itos.items()}
            return vocab
        # Reference pickle: a pickled instance whose attrs we lift out.
        with open(path, "rb") as f:
            obj = _ReferencePickleLoader(f).load()
        vocab = Vocabulary(getattr(obj, "freq_threshold", 5))
        vocab.itos = {int(k): v for k, v in obj.itos.items()}
        vocab.stoi = {v: k for k, v in vocab.itos.items()}
        return vocab


class _Shim:
    """Attribute bag standing in for the reference's Vocabulary class during
    unpickling (we only need itos / freq_threshold)."""

    def __init__(self, *a, **k):
        pass


class _ReferencePickleLoader(pickle.Unpickler):
    def find_class(self, module, name):  # noqa: D401
        if name == "Vocabulary":
            return _Shim
        return super().find_class(module, name)


def build_msr_vtt_vocab(dataset_folder: str = os.path.join("datasets", "MSR-VTT")) -> Vocabulary:
    """Vocab over MSR-VTT train+val captions, ids 0..7008
    (reference src/get_loader.py:92-103)."""
    json_path = os.path.join(dataset_folder, "metadata", "train_val_videodatainfo.json")
    vocab_path = os.path.join(dataset_folder, "metadata", "vocab.json")
    with open(json_path) as f:
        data = json.load(f)
    sentences = [
        s["caption"]
        for s in data["sentences"]
        if 0 <= int(s["video_id"].replace("video", "")) < 7009
    ]
    return Vocabulary.prebuild(sentences, vocab_path)


def build_msvd_vocab(dataset_folder: str = os.path.join("datasets", "MSVD")) -> Vocabulary:
    """Vocab over MSVD train+val captions (reference src/get_loader.py:106-114)."""
    import pandas as pd

    train = pd.read_csv(os.path.join(dataset_folder, "metadata", "train.csv"))["Description"].tolist()
    val = pd.read_csv(os.path.join(dataset_folder, "metadata", "val.csv"))["Description"].tolist()
    vocab_path = os.path.join(dataset_folder, "metadata", "vocab.json")
    return Vocabulary.prebuild(train + val, vocab_path)
