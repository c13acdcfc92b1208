import numpy as np

from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize

# A tiny merges list exercising the BPE merge loop.
TINY_MERGES = [
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
    ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
    ("o", "</w>"),
]


def make_tokenizer():
    return SimpleTokenizer(merges=TINY_MERGES)


def test_merges_applied():
    tok = make_tokenizer()
    ids = tok.encode("hello")
    assert len(ids) == 1  # fully merged into "hello</w>"
    assert tok.decoder[ids[0]] == "hello</w>"
    ids = tok.encode("world")
    assert len(ids) == 1


def test_unknown_word_falls_to_chars():
    tok = make_tokenizer()
    ids = tok.encode("xyz")
    assert len(ids) == 3  # x, y, z</w> (no merges for these)


def test_roundtrip_decode():
    tok = make_tokenizer()
    assert tok.decode(tok.encode("hello world")).strip() == "hello world"


def test_lowercase_and_whitespace_cleanup():
    tok = make_tokenizer()
    assert tok.encode("  HELLO\n\tworld ") == tok.encode("hello world")


def test_tokenize_array_layout():
    tok = make_tokenizer()
    arr = tokenize(["hello", "hello world"], context_length=8, tokenizer=tok)
    assert arr.shape == (2, 8) and arr.dtype == np.int32
    sot, eot = tok.sot_token, tok.eot_token
    assert arr[0, 0] == sot
    assert eot in arr[0]
    # eot is the max id -> argmax pooling finds it
    assert arr[0].argmax() == list(arr[0]).index(eot)
    # padding is zeros after eot
    eot_pos = list(arr[0]).index(eot)
    assert (arr[0, eot_pos + 1 :] == 0).all()


def test_tokenize_truncation_keeps_eot():
    tok = make_tokenizer()
    arr = tokenize(["x " * 50], context_length=8, tokenizer=tok)
    assert arr.shape == (1, 8)
    assert arr[0, -1] == tok.eot_token
