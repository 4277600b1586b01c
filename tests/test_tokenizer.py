"""Tokenizer / Normalizer / pad_sequences unit tests.

Covers the reference's determinism contract: vocab sorted by
(-count, token), OOV=0, __PAD__ last (preprocess.py:64-78)."""

import numpy as np
import pytest

from rat_tpu.features import Normalizer, Tokenizer, pad_sequences


def test_vocab_order_deterministic():
    tok = Tokenizer()
    tok.fit_on_texts(["b", "a", "a", "c", "c", "c"])
    # c (count 3) -> 1, a (count 2) -> 2, b (count 1) -> 3
    assert tok.vocab["c"] == 1
    assert tok.vocab["a"] == 2
    assert tok.vocab["b"] == 3
    assert tok.vocab["__OOV__"] == 0
    assert tok.vocab_size == 4  # 3 tokens + OOV


def test_count_ties_break_lexicographically():
    tok = Tokenizer()
    tok.fit_on_texts(["z", "y", "x"])
    assert tok.vocab["x"] == 1 and tok.vocab["y"] == 2 and tok.vocab["z"] == 3


def test_min_freq_filtering():
    tok = Tokenizer(min_freq=2)
    tok.fit_on_texts(["a", "a", "b"])
    assert "b" not in tok.vocab
    assert tok.encode_category(["b"])[0] == 0  # OOV


def test_padding_index_is_last():
    tok = Tokenizer()
    tok.fit_on_texts(["a", "b"], use_padding=True)
    assert tok.vocab["__PAD__"] == tok.vocab_size - 1


def test_na_value_excluded():
    tok = Tokenizer(na_value="")
    tok.fit_on_texts(["a", "", "", "b"])
    assert "" not in tok.vocab


def test_encode_category_oov():
    tok = Tokenizer()
    tok.fit_on_texts(["a", "b"])
    np.testing.assert_array_equal(tok.encode_category(["a", "zzz", "b"]),
                                  [tok.vocab["a"], 0, tok.vocab["b"]])


def test_sequence_encode_pads_with_last_index():
    tok = Tokenizer(splitter=" ", max_len=3, padding="post")
    tok.fit_on_texts(["a b", "a", "c c c"], use_padding=True)
    enc = tok.encode_sequence(["a", ""])
    pad = tok.vocab_size - 1
    np.testing.assert_array_equal(enc[0], [tok.vocab["a"], pad, pad])
    np.testing.assert_array_equal(enc[1], [pad, pad, pad])


def test_pad_sequences_pre_post():
    seqs = [[1, 2], [3]]
    np.testing.assert_array_equal(
        pad_sequences(seqs, maxlen=3, padding="pre", value=9),
        [[9, 1, 2], [9, 9, 3]])
    np.testing.assert_array_equal(
        pad_sequences(seqs, maxlen=3, padding="post", value=9),
        [[1, 2, 9], [3, 9, 9]])
    # truncation
    np.testing.assert_array_equal(
        pad_sequences([[1, 2, 3, 4]], maxlen=2, truncating="pre"), [[3, 4]])
    np.testing.assert_array_equal(
        pad_sequences([[1, 2, 3, 4]], maxlen=2, truncating="post"), [[1, 2]])


def test_normalizer_standard():
    x = np.array([1.0, 2.0, 3.0])
    nz = Normalizer("StandardScaler")
    nz.fit(x)
    out = nz.normalize(x)
    assert abs(out.mean()) < 1e-9 and abs(out.std() - 1) < 1e-9


def test_normalizer_callable():
    nz = Normalizer(lambda v: v * 2)
    nz.fit(np.array([1.0]))
    np.testing.assert_array_equal(nz.normalize(np.array([1.0, 2.0])), [2.0, 4.0])


def test_normalizer_unknown_raises():
    with pytest.raises(NotImplementedError):
        Normalizer("Nope")
