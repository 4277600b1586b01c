"""Native fastenc extension: bit-parity with the Python paths and a
sanity speedup check."""

import time

import numpy as np
import pytest

from rat_tpu import native
from rat_tpu.features import Tokenizer
import rat_tpu.features.preprocess as pp


@pytest.fixture(scope="module")
def fastenc():
    if not native.build():
        pytest.skip("native toolchain unavailable")
    return native.fastenc


def _force_native(monkeypatch):
    monkeypatch.setattr(pp, "_NATIVE_MIN_ROWS", 0)


def test_encode_category_parity(fastenc, monkeypatch, rng):
    tok = Tokenizer()
    values = [f"v{i}" for i in rng.randint(0, 50, 3000)]
    tok.fit_on_texts(values)
    queries = [f"v{i}" for i in rng.randint(0, 80, 5000)]  # includes OOV
    python_out = np.array([tok.vocab.get(x, 0) for x in queries])
    _force_native(monkeypatch)
    native_out = tok.encode_category(queries)
    np.testing.assert_array_equal(python_out, native_out)


def test_encode_category_float_keys(fastenc, monkeypatch, rng):
    """movielens-style float dtype columns."""
    tok = Tokenizer()
    values = rng.randint(0, 30, 2000).astype(np.float64)
    tok.fit_on_texts(values)
    python_out = np.array([tok.vocab.get(x, 0) for x in values])
    _force_native(monkeypatch)
    native_out = tok.encode_category(list(values))
    np.testing.assert_array_equal(python_out, native_out)


def test_encode_sequence_parity(fastenc, monkeypatch, rng):
    texts = []
    for _ in range(2000):
        n = rng.randint(0, 6)
        texts.append(" ".join(f"t{i}" for i in rng.randint(0, 40, n)))
    tok = Tokenizer(splitter=" ", max_len=4, padding="post")
    tok.fit_on_texts(texts, use_padding=True)
    python_out = Tokenizer.encode_sequence.__wrapped__(tok, texts) \
        if hasattr(Tokenizer.encode_sequence, "__wrapped__") else None
    # python path: force threshold high
    monkeypatch.setattr(pp, "_NATIVE_MIN_ROWS", 10**9)
    python_out = tok.encode_sequence(texts)
    _force_native(monkeypatch)
    native_out = tok.encode_sequence(texts)
    np.testing.assert_array_equal(python_out, native_out)


def test_encode_sequence_pre_padding_parity(fastenc, monkeypatch, rng):
    texts = ["a b c d e", "a", "", "b c"]
    tok = Tokenizer(splitter=" ", max_len=3, padding="pre")
    tok.fit_on_texts([t for t in texts if t], use_padding=True)
    monkeypatch.setattr(pp, "_NATIVE_MIN_ROWS", 10**9)
    python_out = tok.encode_sequence(texts)
    _force_native(monkeypatch)
    native_out = tok.encode_sequence(texts)
    np.testing.assert_array_equal(python_out, native_out)


def test_count_tokens_parity(fastenc, monkeypatch, rng):
    texts = [" ".join(f"t{i}" for i in rng.randint(0, 30, rng.randint(1, 5)))
             for _ in range(1500)]
    tok_py = Tokenizer(splitter=" ")
    monkeypatch.setattr(pp, "_NATIVE_MIN_ROWS", 10**9)
    tok_py.fit_on_texts(texts, use_padding=True)
    tok_c = Tokenizer(splitter=" ")
    _force_native(monkeypatch)
    tok_c.fit_on_texts(texts, use_padding=True)
    assert tok_py.vocab == tok_c.vocab
    assert tok_py.max_len == tok_c.max_len


def test_native_sequence_encode_is_faster(fastenc, monkeypatch, rng):
    texts = [" ".join(f"t{i}" for i in rng.randint(0, 5000, 3))
             for _ in range(150_000)]
    tok = Tokenizer(splitter=" ", max_len=3, padding="post")
    tok.fit_on_texts(texts, use_padding=True)
    monkeypatch.setattr(pp, "_NATIVE_MIN_ROWS", 10**9)
    t0 = time.perf_counter()
    py_out = tok.encode_sequence(texts)
    py_time = time.perf_counter() - t0
    _force_native(monkeypatch)
    t0 = time.perf_counter()
    c_out = tok.encode_sequence(texts)
    c_time = time.perf_counter() - t0
    np.testing.assert_array_equal(py_out, c_out)
    assert c_time < py_time, (py_time, c_time)


def test_non_string_vocab_never_takes_stringify_path(fastenc, monkeypatch,
                                                     rng):
    """The '__OOV__' sentinel is a str even in int-fit vocabs; dispatch
    must look at the REAL tokens, else dtype drift between fit and
    transform (int-fit vocab, float queries) OOVs every value via
    '5.0' != '5' stringified lookups."""
    tok = Tokenizer()
    values = rng.randint(0, 30, 2000).astype(np.int64)
    tok.fit_on_texts(values)
    assert not tok._string_vocab()
    _force_native(monkeypatch)
    queries = values[:500].astype(np.float64)  # dtype drift
    out = tok.encode_category(list(queries))
    expected = np.array([tok.vocab.get(int(x), 0) for x in queries])
    np.testing.assert_array_equal(out, expected)
    assert (out != 0).any()  # nothing silently OOV'd
