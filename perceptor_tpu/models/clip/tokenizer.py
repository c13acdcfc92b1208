"""CLIP BPE tokenizer.

A from-scratch implementation of the byte-pair tokenizer used by all CLIP
family checkpoints (the reference gets it from `open_clip.tokenize`,
reference perceptor/models/open_clip.py:101). Loads the standard
`bpe_simple_vocab_16e6.txt(.gz)` merges file; the merges list can also be
injected directly (used by hermetic tests).

Tokenization is host-side (strings never reach the device); the output is a
static (N, context_length) int32 array — a jit-friendly constant.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BPE_PATHS = (
    os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz"),
    os.path.expanduser("~/.cache/perceptor_tpu/bpe_simple_vocab_16e6.txt.gz"),
    "models/bpe_simple_vocab_16e6.txt.gz",
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (GPT-2/CLIP convention)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: Tuple[str, ...]) -> set:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    def __init__(
        self,
        bpe_path: Optional[str] = None,
        merges: Optional[List[Tuple[str, str]]] = None,
    ):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        if merges is None:
            path = bpe_path or next(
                (p for p in DEFAULT_BPE_PATHS if os.path.exists(p)), None
            )
            if path is None:
                raise FileNotFoundError(
                    "CLIP BPE vocab not found. Download "
                    "bpe_simple_vocab_16e6.txt.gz (openai/CLIP) to one of: "
                    f"{DEFAULT_BPE_PATHS} or pass bpe_path=/merges=."
                )
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            # standard file: first line is a version header; merges occupy
            # lines 1..49152-256-2+1
            lines = lines[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(line.split()) for line in lines if line]

        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])

        self.encoder = {token: i for i, token in enumerate(vocab)}
        self.decoder = {i: token for token, i in self.encoder.items()}
        self.bpe_ranks = {merge: i for i, merge in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        # unicode word classes need the `regex` module; std `re` lacks \p
        # (ascii fallback keeps hermetic environments working)
        regex_mod = _regex_module()
        if regex_mod is not None:
            self.pat = regex_mod.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
                regex_mod.IGNORECASE,
            )
        else:
            self.pat = re.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
                re.IGNORECASE,
            )

    @property
    def sot_token(self) -> int:
        return self.encoder["<|startoftext|>"]

    @property
    def eot_token(self) -> int:
        return self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ") if t in self.encoder
            )
        return bpe_tokens

    def decode(self, tokens: Sequence[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


def _regex_module():
    try:
        import regex

        return regex
    except ImportError:
        return None


def tokenize(
    texts: Sequence[str],
    context_length: int = 77,
    tokenizer: Optional[SimpleTokenizer] = None,
) -> np.ndarray:
    """(N, context_length) int32 token array: <sot> tokens <eot> 0-padded.

    Over-long prompts are truncated with EOT preserved as the final token
    (open_clip's truncate behavior; the reference warns on truncation at
    transformers_openai_clip.py-style wrappers).
    """
    if isinstance(texts, str):
        texts = [texts]
    tokenizer = tokenizer or SimpleTokenizer()
    sot, eot = tokenizer.sot_token, tokenizer.eot_token
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tokenizer.encode(text) + [eot]
        if len(tokens) > context_length:
            tokens = tokens[:context_length]
            tokens[-1] = eot
        result[i, : len(tokens)] = tokens
    return result
