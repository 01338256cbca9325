"""Tokenizers: BERT-style WordPiece and CLIP-style BPE, offline-first.

The reference uses HF ``BertTokenizerFast`` (``SDFusion_bert/bert_network/network.py:18-43``)
and the LDM CLIP tokenizer, both of which download vocab files. This environment (and any
air-gapped TPU pod) cannot; so these tokenizers

* load standard ``vocab.txt`` (WordPiece) / ``merges.txt`` + ``vocab.json`` (BPE) when paths
  are given — producing ids identical to the HF originals, which is what checkpoint-parity
  needs; and
* otherwise fall back to a deterministic built-in **domain vocabulary** covering the
  reference's prompt grammar ("Set Forest color to dark green", "Render Road as a dashed
  line pattern", ...) plus stable hash buckets for OOV words — self-contained, reproducible,
  and adequate for training from scratch.

Both produce fixed-length-77 sequences with the reference's padding semantics
(BERT: [CLS] ... [SEP] [PAD]*; CLIP: <sot> ... <eot> <eot>*).
"""
from __future__ import annotations

import hashlib
import re
from pathlib import Path

import numpy as np

MAXLEN = 77  # reference MAXLEN=77 (`multiseg_19prompts_batch1_shuffle_addlrSD.py:55`)

# Vocabulary of the reference prompt grammar (SURVEY.md §2; prompts like
# "Set Forest color to dark green", "Render Stream as a dotted line", visibility suite).
_DOMAIN_WORDS = """
set render make draw show hide change turn fill color colour to as with in a an the and of
forest lake river stream road roads path paths building buildings background tree trees
contour line lines map maps swiss topo topographic style styled water
dark light pale deep bright dim faded saturated
green blue red yellow orange purple pink brown black white gray grey beige olive navy
turquoise cyan magenta violet crimson maroon teal gold silver
dashed dotted solid thin thick wide narrow bold double
pattern texture hatch hatched diagonal cross crossed stripe striped grid
symbol mark marker triangle square circle point shaped small large tiny big
visible invisible transparent opaque remove removed empty without
element styling visibility item siegfried sheet tile
""".split()

_WORD_RE = re.compile(r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]")


def _stable_hash(word: str) -> int:
    return int.from_bytes(hashlib.sha256(word.encode()).digest()[:4], "little")


class WordPieceTokenizer:
    """BERT-compatible interface: ``encode(texts) -> [B, 77] int32`` + attention mask.

    With a ``vocab.txt`` this is standard greedy longest-match-first WordPiece (uncased),
    id-compatible with ``bert-base-uncased``. Without one, whole lowercased words map to a
    built-in domain vocab with hash-bucket OOV — same special-token layout.
    """

    PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"

    def __init__(self, vocab_file: str | Path | None = None, vocab_size: int = 30522):
        self.vocab_size = vocab_size
        if vocab_file is not None:
            words = Path(vocab_file).read_text(encoding="utf-8").splitlines()
            self.vocab = {w: i for i, w in enumerate(words)}
            self.vocab_size = len(self.vocab)
            self._wordpiece = True
        else:
            specials = [self.PAD, self.UNK, self.CLS, self.SEP, self.MASK]
            self.vocab = {w: i for i, w in enumerate(specials)}
            for w in _DOMAIN_WORDS:
                if w not in self.vocab:
                    self.vocab[w] = len(self.vocab)
            self._hash_base = len(self.vocab)
            self._wordpiece = False
        self.pad_id = self.vocab[self.PAD]
        self.cls_id = self.vocab[self.CLS]
        self.sep_id = self.vocab[self.SEP]
        self.unk_id = self.vocab[self.UNK]

    def _word_ids(self, word: str) -> list[int]:
        if not self._wordpiece:
            if word in self.vocab:
                return [self.vocab[word]]
            bucket = self._hash_base + _stable_hash(word) % (self.vocab_size - self._hash_base)
            return [bucket]
        # Greedy longest-match WordPiece.
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, texts: list[str], maxlen: int = MAXLEN) -> tuple[np.ndarray, np.ndarray]:
        """Returns (ids [B, maxlen] int32, attn_mask [B, maxlen] int32)."""
        out = np.full((len(texts), maxlen), self.pad_id, np.int32)
        mask = np.zeros((len(texts), maxlen), np.int32)
        for bi, text in enumerate(texts):
            ids = [self.cls_id]
            for w in _WORD_RE.findall(text.lower()):
                ids.extend(self._word_ids(w))
            ids = ids[: maxlen - 1] + [self.sep_id]
            out[bi, : len(ids)] = ids
            mask[bi, : len(ids)] = 1
        return out, mask


class CLIPTokenizer:
    """CLIP-compatible interface: ``encode(texts) -> [B, 77] int32``.

    With ``vocab.json`` + ``merges.txt`` this is the standard lowercased byte-BPE of
    openai/clip-vit-large-patch14 (id-compatible). Without files, the domain-vocab fallback
    uses the same layout: <sot> tokens <eot>, padded with <eot> (CLIP's convention — the
    first <eot> position is the pooled "EOS" slot the fusion code searches for,
    ``token_utils.py:16-29``).
    """

    def __init__(
        self,
        vocab_file: str | Path | None = None,
        merges_file: str | Path | None = None,
        vocab_size: int = 49408,
    ):
        self.vocab_size = vocab_size
        if vocab_file is not None and merges_file is not None:
            import json

            self.encoder = json.loads(Path(vocab_file).read_text(encoding="utf-8"))
            merges = Path(merges_file).read_text(encoding="utf-8").splitlines()
            merges = [tuple(m.split()) for m in merges if m and not m.startswith("#version")]
            self.bpe_ranks = {m: i for i, m in enumerate(merges)}
            self._bpe = True
            self.sot_id = self.encoder["<|startoftext|>"]
            self.eot_id = self.encoder["<|endoftext|>"]
        else:
            self._bpe = False
            self.sot_id = vocab_size - 2
            self.eot_id = vocab_size - 1
            self._domain = {w: i + 2 for i, w in enumerate(dict.fromkeys(_DOMAIN_WORDS))}
            self._hash_base = len(self._domain) + 2

    def _bpe_word(self, word: str) -> list[int]:
        token = word + "</w>"
        chars = list(word[:-1]) + [word[-1] + "</w>"] if word else []
        if not chars:
            return []
        while len(chars) > 1:
            pairs = [(chars[i], chars[i + 1]) for i in range(len(chars) - 1)]
            ranked = [(self.bpe_ranks.get(p, 1 << 30), i, p) for i, p in enumerate(pairs)]
            rank, i, pair = min(ranked)
            if rank == 1 << 30:
                break
            chars = chars[:i] + ["".join(pair)] + chars[i + 2 :]
        unk = self.encoder.get("<|endoftext|>")
        return [self.encoder.get(c, unk) for c in chars]

    def _word_ids(self, word: str) -> list[int]:
        if self._bpe:
            return self._bpe_word(word)
        if word in self._domain:
            return [self._domain[word]]
        return [self._hash_base + _stable_hash(word) % (self.vocab_size - 2 - self._hash_base)]

    def encode(self, texts: list[str], maxlen: int = MAXLEN) -> np.ndarray:
        out = np.full((len(texts), maxlen), self.eot_id, np.int32)
        for bi, text in enumerate(texts):
            ids = [self.sot_id]
            for w in _WORD_RE.findall(text.lower()):
                ids.extend(self._word_ids(w))
            ids = ids[: maxlen - 1] + [self.eot_id]
            out[bi, : len(ids)] = ids
        return out

    def first_eot_index(self, ids: np.ndarray) -> np.ndarray:
        """Per-row index of the first <eot> token — the CLIP pooled slot and the write-start
        anchor of the pad-fusion (``token_utils.py:16-29``)."""
        return np.argmax(ids == self.eot_id, axis=-1)
