import gzip
import os

import numpy as np
import pytest

from menghini_neurips23_tpu.tokenizer import CONTEXT_LENGTH, ClipTokenizer, bytes_to_unicode


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_fallback_vocab_size():
    tok = ClipTokenizer(None)
    assert tok.vocab_size == 514
    assert tok.sot_token == 512
    assert tok.eot_token == 513


def test_tokenize_shape_and_framing():
    tok = ClipTokenizer(None)
    out = tok.tokenize(["a photo of a dog", "a photo of a cat"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.sot_token
    eot_pos = int(out[0].argmax())
    assert out[0, eot_pos] == tok.eot_token
    assert (out[0, eot_pos + 1 :] == 0).all()


def test_tokenize_deterministic_and_roundtrip():
    tok = ClipTokenizer(None)
    a = tok.tokenize("a photo of a dog")
    b = tok.tokenize("a photo of a dog")
    np.testing.assert_array_equal(a, b)
    ids = tok.encode("hello world")
    assert tok.decode(ids).strip() == "hello world"


def test_tokenize_overflow_raises():
    tok = ClipTokenizer(None)
    with pytest.raises(RuntimeError):
        tok.tokenize("x " * 200)
    out = tok.tokenize("x " * 200, truncate=True)
    assert out.shape == (1, CONTEXT_LENGTH)
    assert out[0, -1] == tok.eot_token


def test_merges_file_loading(tmp_path):
    """A synthetic merges file exercises the real BPE merge path."""
    header = "#version: synthetic"
    merges = ["h e", "he l", "hel l", "hell o</w>"]
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join([header] + merges))
    tok = ClipTokenizer(str(path))
    assert tok.vocab_size == 512 + len(merges) + 2
    ids = tok.encode("hello")
    assert ids == [tok.encoder["hello</w>"]]
    # multi-token word still decodes
    assert tok.decode(tok.encode("help")).strip() == "help"


def test_lowercase_and_whitespace_cleaning():
    tok = ClipTokenizer(None)
    np.testing.assert_array_equal(
        tok.tokenize("A   Photo\tof a DOG"), tok.tokenize("a photo of a dog")
    )


def test_roundtrip_fuzz():
    r"""Byte-level fallback must roundtrip arbitrary printable ASCII.  CLIP's
    token pattern splits every digit into its own token ([\p{N}]) and decode
    re-inserts word boundaries, so comparison ignores spacing (content must
    be preserved exactly); pure-letter strings roundtrip with spacing too."""
    import random

    tok = ClipTokenizer(None)
    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,!?-_/()'"
    for _ in range(50):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        norm = " ".join(s.lower().split())
        if not norm:
            continue
        out = tok.decode(tok.encode(s))
        assert out.replace(" ", "") == norm.replace(" ", ""), (s, out)
    for _ in range(20):
        s = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(rng.randint(1, 30)))
        norm = " ".join(s.split())
        if not norm:
            continue
        out = tok.decode(tok.encode(s)).strip()
        assert " ".join(out.split()) == norm, (s, out)
