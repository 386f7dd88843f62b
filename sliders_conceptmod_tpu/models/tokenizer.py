"""Tokenization — CLIP BPE via local files, or a deterministic stub.

Parity target: reference ``text_tokenize`` (train_util.py:108-118):
padding to ``model_max_length`` (77), truncation, input_ids only.

Two implementations behind one callable interface
``tokenize(prompts: list[str]) -> np.int32 [B, max_len]``:

* :class:`CLIPTokenizerFiles` — transformers' CLIPTokenizer constructed from
  ``vocab.json`` + ``merges.txt`` inside a local model directory (no network;
  this is host-side text preprocessing, exactly the role the tokenizer plays
  in the reference).
* :class:`HashTokenizer` — deterministic hash-based ids for environments
  without tokenizer assets (CI, weightless benchmarks). Same shapes/special
  tokens; NOT a language tokenizer.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


class CLIPTokenizerFiles:
    def __init__(self, tokenizer_dir: str, max_length: int = 77, pad_token_id=None):
        from transformers import CLIPTokenizer

        self._tok = CLIPTokenizer(
            vocab_file=os.path.join(tokenizer_dir, "vocab.json"),
            merges_file=os.path.join(tokenizer_dir, "merges.txt"),
        )
        if pad_token_id is not None:
            # SDXL tokenizer_2 (open-clip) pads with id 0 ("!") —
            # reference model_util.py:164-208
            self._tok.pad_token_id = pad_token_id
        self.max_length = max_length

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        enc = self._tok(
            list(prompts),
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
        )
        return np.asarray(enc["input_ids"], dtype=np.int32)

    @property
    def vocab_size(self) -> int:
        return len(self._tok)

    def add_tokens(self, token: str) -> int:
        """Register a modifier/TI token; returns its id (baselines:
        reference generate_images_customdiffusion.py:482-498 add_tokens +
        resize_token_embeddings flow)."""
        if self._tok.add_tokens(token) == 0:
            raise ValueError(f"tokenizer already contains the token {token}")
        return self._tok.convert_tokens_to_ids(token)


class HashTokenizer:
    """bos + word-hash ids + eos, padded with eos (CLIP pad==eos for te1)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77, bos: int = 49406, eos: int = 49407, pad=None):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos, self.eos = bos, eos
        self.pad = eos if pad is None else pad
        self._added = {}  # modifier/TI tokens: word -> id past the table

    def add_tokens(self, token: str) -> int:
        key = token.lower()
        if key in self._added:
            raise ValueError(f"tokenizer already contains the token {token}")
        self._added[key] = self.vocab_size + len(self._added)
        return self._added[key]

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        out = np.full((len(prompts), self.max_length), self.pad, dtype=np.int32)
        for i, p in enumerate(prompts):
            ids = [self.bos]
            for w in p.lower().split()[: self.max_length - 2]:
                if w in self._added:
                    ids.append(self._added[w])
                    continue
                h = 0
                for ch in w:  # stable across runs (unlike hash())
                    h = (h * 131 + ord(ch)) % (self.vocab_size - 3)
                ids.append(h + 1)
            ids.append(self.eos)
            out[i, : len(ids)] = ids
        return out


class T5SpmTokenizer:
    """T5 unigram tokenizer built directly from a ``spiece.model`` protobuf —
    no ``sentencepiece`` package (absent in this image): the ModelProto is
    parsed with transformers' bundled pb2 and rebuilt as a ``tokenizers``
    Unigram model, following the standard T5 fast-tokenizer conversion
    (Precompiled charsmap normalizer + Metaspace pre-tokenizer + eos append;
    pad id 0). Covers Flux checkpoint dirs that ship only spiece.model
    (reference loads T5 via the HF pipeline, model_util.py:238-268)."""

    def __init__(self, spm_file: str, max_length: int = 512):
        from tokenizers import Regex, Tokenizer, models, normalizers, pre_tokenizers

        try:
            from transformers.utils import sentencepiece_model_pb2_new as pb2
        except ImportError:  # older transformers layout
            from transformers.utils import sentencepiece_model_pb2 as pb2

        m = pb2.ModelProto()
        with open(spm_file, "rb") as f:
            m.ParseFromString(f.read())
        vocab = [(p.piece, p.score) for p in m.pieces]
        self._tok = Tokenizer(models.Unigram(vocab, m.trainer_spec.unk_id))
        norms = []
        if m.normalizer_spec.precompiled_charsmap:
            norms.append(normalizers.Precompiled(m.normalizer_spec.precompiled_charsmap))
        norms.append(normalizers.Replace(Regex(" {2,}"), " "))
        self._tok.normalizer = normalizers.Sequence(norms)
        self._tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="always")
        self.eos = m.trainer_spec.eos_id if m.trainer_spec.eos_id >= 0 else 1
        self.pad = m.trainer_spec.pad_id if m.trainer_spec.pad_id >= 0 else 0
        self.max_length = max_length

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        out = np.full((len(prompts), self.max_length), self.pad, dtype=np.int32)
        for i, p in enumerate(prompts):
            ids = self._tok.encode(p).ids[: self.max_length - 1] + [self.eos]
            out[i, : len(ids)] = ids
        return out


def load_tokenizer(model_dir: str, component: str = "tokenizer", max_length: int = 77, pad_token_id=None):
    """CLIP tokenizer from <model_dir>/<component>; HashTokenizer fallback."""
    tdir = os.path.join(model_dir, component) if model_dir else ""
    if tdir and os.path.isfile(os.path.join(tdir, "vocab.json")):
        return CLIPTokenizerFiles(tdir, max_length=max_length, pad_token_id=pad_token_id)
    return HashTokenizer(max_length=max_length, pad=pad_token_id)
