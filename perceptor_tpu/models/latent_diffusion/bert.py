"""BERT-style x-transformer text encoder for LDM txt2img conditioning.

Functional spec: reference
perceptor/models/latent_diffusion/ldm/modules/encoders/modules.py:91-120
(BERTEmbedder: BERT wordpiece tokenizer + TransformerWrapper) and the
vendored x_transformer.py: token embedding + learned absolute positions,
`depth` pre-LN blocks of [Attention (no-bias qkv, heads=8, dim_head=64),
FeedForward (GELU, mult 4)], final LayerNorm, returned as embeddings.

Tokenization is host-side WordPiece against a local bert-base-uncased
vocab.txt (zero-egress: resolved from the checkpoint cache; hermetic tests
inject a vocab list).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BERTConfig:
    vocab_size: int = 30522
    width: int = 1280
    depth: int = 32
    heads: int = 8
    dim_head: int = 64
    max_seq_len: int = 77


TINY_BERT = BERTConfig(vocab_size=64, width=32, depth=2, heads=2, dim_head=16,
                       max_seq_len=16)


class XTransformerAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, dim = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)

        def split(t):
            return t.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(dim, dtype=self.dtype, name="to_out")(out)


class BERTEncoder(nn.Module):
    config: BERTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens (N, S) int32 -> (N, S, width) fp32 embeddings."""
        cfg = self.config
        token_emb = self.param(
            "token_emb", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width)
        )
        pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.02), (cfg.max_seq_len, cfg.width)
        )
        x = token_emb[tokens].astype(self.dtype)
        x = x + pos_emb[: tokens.shape[1]].astype(self.dtype)
        for i in range(cfg.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"attn_norm_{i}")(x)
            x = x + XTransformerAttention(
                cfg.heads, cfg.dim_head, self.dtype, name=f"attn_{i}"
            )(h.astype(self.dtype))
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ff_norm_{i}")(x)
            h = nn.Dense(cfg.width * 4, dtype=self.dtype, name=f"ff_{i}_proj")(
                h.astype(self.dtype)
            )
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(cfg.width, dtype=self.dtype, name=f"ff_{i}_out")(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_norm")(x)
        return x.astype(jnp.float32)


def convert_bert(state_dict: Dict, cfg: BERTConfig, prefix: str = "cond_stage_model.transformer.") -> Dict:
    """x-transformer TransformerWrapper state_dict -> BERTEncoder params.

    torch naming: token_emb.weight, pos_emb.emb.weight,
    attn_layers.layers.{2i}.0.{weight,bias} (LN) .1.to_{q,k,v}.weight
    .1.to_out.{weight,bias}; layers.{2i+1} = [LN, FeedForward(net.0.0, net.2)];
    norm.{weight,bias}.
    """
    from perceptor_tpu.models.clip.convert import _np

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def linear(name, bias=True):
        out = {"kernel": _np(sd[f"{name}.weight"]).T}
        if bias and f"{name}.bias" in sd:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    def norm(name):
        return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}

    params = {
        "token_emb": _np(sd["token_emb.weight"]),
        "pos_emb": _np(sd["pos_emb.emb.weight"]),
        "final_norm": norm("norm"),
    }
    for i in range(cfg.depth):
        a, f = 2 * i, 2 * i + 1
        params[f"attn_norm_{i}"] = norm(f"attn_layers.layers.{a}.0")
        params[f"attn_{i}"] = {
            "to_q": linear(f"attn_layers.layers.{a}.1.to_q", bias=False),
            "to_k": linear(f"attn_layers.layers.{a}.1.to_k", bias=False),
            "to_v": linear(f"attn_layers.layers.{a}.1.to_v", bias=False),
            "to_out": linear(f"attn_layers.layers.{a}.1.to_out"),
        }
        params[f"ff_norm_{i}"] = norm(f"attn_layers.layers.{f}.0")
        params[f"ff_{i}_proj"] = linear(f"attn_layers.layers.{f}.1.net.0.0")
        params[f"ff_{i}_out"] = linear(f"attn_layers.layers.{f}.1.net.2")
    return params


# -- WordPiece tokenizer (bert-base-uncased semantics) ------------------------

_VOCAB_PATHS = (
    "models/bert-base-uncased-vocab.txt",
    os.path.expanduser("~/.cache/perceptor_tpu/bert-base-uncased-vocab.txt"),
)


class BERTTokenizer:
    def __init__(self, vocab: Optional[Sequence[str]] = None,
                 max_length: int = 77):
        if vocab is None:
            for path in _VOCAB_PATHS:
                if os.path.exists(path):
                    vocab = [
                        line.rstrip("\n") for line in open(path, encoding="utf-8")
                    ]
                    break
            else:
                raise FileNotFoundError(
                    "BERT vocab not found; place bert-base-uncased-vocab.txt in "
                    f"{_VOCAB_PATHS} or pass vocab=."
                )
        self.vocab = {token: i for i, token in enumerate(vocab)}
        self.max_length = max_length
        self.cls = self.vocab.get("[CLS]", 0)
        self.sep = self.vocab.get("[SEP]", 0)
        self.pad = self.vocab.get("[PAD]", 0)
        self.unk = self.vocab.get("[UNK]", 0)

    def _wordpiece(self, word: str) -> List[int]:
        if word in self.vocab:
            return [self.vocab[word]]
        tokens, start = [], 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = self.vocab[sub]
                    break
                end -= 1
            if piece is None:
                return [self.unk]
            tokens.append(piece)
            start = end
        return tokens

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        import re

        rows = []
        for text in texts:
            words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())
            ids = [self.cls]
            for word in words:
                ids.extend(self._wordpiece(word))
            ids = ids[: self.max_length - 1] + [self.sep]
            ids = ids + [self.pad] * (self.max_length - len(ids))
            rows.append(ids)
        return np.asarray(rows, dtype=np.int32)
