"""Host-side column encoders: Tokenizer, Normalizer, pad_sequences.

Behavioral contract (re-implemented from the reference's observable
behavior, fuxictr/preprocess.py:30-191 — not its code):

- vocab order is deterministic: tokens ranked by (-count, token), ids
  start at ``1 + oov_token``;
- OOV maps to index 0 (``oov_token``); ``__PAD__`` takes the LAST index
  when padding is enabled;
- ``vocab_size`` counts OOV (and PAD when present);
- sequence encode pads/truncates to ``max_len`` with the padding index.

The implementations are vectorized rather than per-row Python loops:
category encoding rides a pandas hash-map lookup, and sequence
encoding/padding use a flat gather/scatter over the concatenated token
stream (one ragged->dense scatter instead of N row writes). A native
C++ fast path (rat_tpu/native/fastenc.cpp) takes over both for very
large columns.
"""

import json
import multiprocessing
import os
from collections import Counter
from concurrent.futures import ProcessPoolExecutor, as_completed
from itertools import chain

import h5py
import numpy as np
import pandas as pd
import sklearn.preprocessing as sklearn_preprocess

try:  # native fast path (rat_tpu/native/fastenc.cpp); Python fallback below
    from ..native import build as _build_native
    from .. import native as _native
except Exception:  # pragma: no cover
    _native = None

# only worth building/binding above this row count
_NATIVE_MIN_ROWS = 50_000


def _fastenc(n_rows):
    if _native is None or n_rows < _NATIVE_MIN_ROWS:
        return None
    if _native.fastenc is None:
        _build_native()
    return _native.fastenc


def count_tokens(texts, splitter):
    """(token -> count, longest row) over one chunk of sequence cells."""
    parts = [str(t).split(splitter) for t in texts]
    longest = max(map(len, parts), default=0)
    return Counter(chain.from_iterable(parts)), longest


def _clean_text_cells(texts):
    """Nulls -> '' so .split never sees NaN."""
    return ["" if (not isinstance(t, str) and pd.isnull(t)) else t
            for t in texts]


class Tokenizer(object):
    """Categorical/sequence values -> integer ids with a ranked vocab."""

    def __init__(self, num_words=None, na_value=None, min_freq=1, splitter=None,
                 lower=False, oov_token=0, max_len=0, padding="pre", num_workers=4):
        self._num_words = num_words
        self._na_value = na_value
        self._min_freq = min_freq
        self._lower = lower
        self._splitter = splitter
        self.oov_token = oov_token  # 0 reserved for __OOV__
        self.vocab = dict()
        self.vocab_size = 0  # includes oov and padding entries
        self.max_len = max_len
        self.padding = padding
        self.num_workers = num_workers
        self.use_padding = False

    # ---------------- fitting ----------------

    def _count_sequence_tokens(self, texts):
        """Token counts + longest row for a sequence column, via the
        native counter, a process pool, or a single pass — whichever the
        column size warrants."""
        enc = _fastenc(len(texts))
        if enc is not None:
            counts, longest = enc.count_tokens(_clean_text_cells(texts),
                                               self._splitter)
            return Counter(counts), longest
        if len(texts) >= 200_000 and self.num_workers > 1:
            # chunk-parallel counting; 'spawn' because forking after JAX
            # initializes can deadlock
            ctx = multiprocessing.get_context("spawn")
            chunks = np.array_split(np.asarray(texts, dtype=object),
                                    self.num_workers)
            totals, longest = Counter(), 0
            with ProcessPoolExecutor(max_workers=self.num_workers,
                                     mp_context=ctx) as pool:
                futs = [pool.submit(count_tokens, c, self._splitter)
                        for c in chunks]
                for fut in as_completed(futs):
                    part, part_longest = fut.result()
                    totals.update(part)
                    longest = max(longest, part_longest)
            return totals, longest
        return count_tokens(list(texts), self._splitter)

    def fit_on_texts(self, texts, use_padding=False):
        self.use_padding = use_padding
        if self._splitter is None:  # scalar categorical column
            counts = Counter(list(texts))
        else:
            counts, longest = self._count_sequence_tokens(texts)
            if self.max_len == 0:
                self.max_len = longest
        self.build_vocab(counts)

    def build_vocab(self, word_counts):
        """Rank tokens by (count desc, token asc), drop rare/na tokens,
        and assign ids from ``1 + oov_token`` in rank order."""
        if not isinstance(word_counts, dict):
            word_counts = dict(word_counts)
        ranked = sorted(
            (t for t, c in word_counts.items()
             if c >= self._min_freq and t != self._na_value),
            key=lambda t: (-word_counts[t], t))
        if self._num_words:
            ranked = ranked[:self._num_words]
        if self._lower:
            ranked = [t.lower() for t in ranked]
        first_id = self.oov_token + 1
        self.vocab = {"__OOV__": self.oov_token}
        self.vocab.update(zip(ranked, range(first_id, first_id + len(ranked))))
        if self.use_padding:
            self.vocab["__PAD__"] = first_id + len(ranked)  # last index
        self.vocab_size = len(self.vocab) + self.oov_token

    # ---------------- encoding ----------------

    def _string_vocab(self):
        """True iff the REAL tokens are strings — the '__OOV__'/'__PAD__'
        sentinels are always str, so they must not decide the dispatch
        (a '5.0' vs '5' stringified lookup would OOV every numeric
        value encoded against an int-fit vocab)."""
        for k in self.vocab:
            if k not in ("__OOV__", "__PAD__"):
                return isinstance(k, str)
        return False

    def encode_category(self, categories):
        enc = _fastenc(len(categories))
        # the C++ map only beats pandas' vectorized hash lookup for
        # string keys (it skips per-item boxing on huge columns)
        if enc is not None and len(categories) and self._string_vocab():
            return np.array(enc.encode_category(
                list(categories), self.vocab, self.oov_token))
        mapped = pd.Series(categories).map(self.vocab)
        return mapped.fillna(self.oov_token).to_numpy(dtype=np.int64)

    def encode_sequence(self, texts):
        pad_id = self.vocab_size - 1
        enc = _fastenc(len(texts))
        if enc is not None:
            rows = enc.encode_sequences(
                _clean_text_cells(texts), self.vocab,
                self.oov_token, self._splitter, self.max_len,
                pad_id, self.padding == "pre", self.padding == "pre")
            return np.array(rows, dtype="int32")
        # flat vectorized path: split rows, map the concatenated token
        # stream through the vocab once, then one ragged->dense scatter
        tokens = [t.split(self._splitter) if t else []
                  for t in _clean_text_cells(texts)]
        lens = np.fromiter(map(len, tokens), count=len(tokens),
                           dtype=np.int64)
        flat = list(chain.from_iterable(tokens))
        ids = (pd.Series(flat).map(self.vocab).fillna(self.oov_token)
               .to_numpy(dtype=np.int64)) if flat else np.zeros(0, np.int64)
        return _scatter_ragged(ids, lens, self.max_len, pad_id,
                               pad_pre=self.padding == "pre",
                               trunc_pre=self.padding == "pre")

    # ---------------- vocab IO ----------------

    def load_pretrained_embedding(self, feature_name, pretrain_path, embedding_dim,
                                  output_path, feature_dtype=str, freeze_emb=True):
        """Grow the vocab with pretrained keys and export the id-aligned
        embedding matrix to h5. PAD (when present) stays the last index
        with a zero vector; un-pretrained rows are zero when frozen,
        N(0, 1e-4) otherwise."""
        with h5py.File(pretrain_path, "r") as hf:
            pre_keys = hf["key"][:].astype(feature_dtype)
            pre_vectors = hf["value"][:]
        novel = [k for k in pre_keys if k not in self.vocab]
        # new ids slot in where PAD sits (PAD then moves back to last)
        next_id = self.vocab.get("__PAD__", self.vocab_size)
        self.vocab.update(zip(novel, range(next_id, next_id + len(novel))))
        self.vocab_size += len(novel)
        if freeze_emb:
            matrix = np.zeros((self.vocab_size, embedding_dim))
        else:
            matrix = np.random.normal(0, 1e-4, (self.vocab_size, embedding_dim))
        if "__PAD__" in self.vocab:
            self.vocab["__PAD__"] = self.vocab_size - 1
            matrix[-1] = 0
        rows = np.fromiter((self.vocab[k] for k in pre_keys),
                           count=len(pre_keys), dtype=np.int64)
        matrix[rows] = pre_vectors
        os.makedirs(os.path.dirname(output_path), exist_ok=True)
        with h5py.File(output_path, "w") as hf:
            hf.create_dataset(feature_name, data=matrix)

    def load_vocab_from_file(self, vocab_file):
        with open(vocab_file, "r") as fid:
            self.build_vocab(json.load(fid))

    def set_vocab(self, vocab):
        self.vocab = vocab
        self.vocab_size = len(self.vocab) + self.oov_token


class Normalizer(object):
    """Numeric column scaler: a named sklearn scaler or any callable."""

    _SKLEARN_SCALERS = ("StandardScaler", "MinMaxScaler")

    def __init__(self, normalizer):
        self.callable = callable(normalizer)
        if self.callable:
            self.normalizer = normalizer
        elif normalizer in self._SKLEARN_SCALERS:
            self.normalizer = getattr(sklearn_preprocess, normalizer)()
        else:
            raise NotImplementedError("normalizer={}".format(normalizer))

    def fit(self, X):
        if not self.callable:
            self.normalizer.fit(X.reshape(-1, 1))

    def normalize(self, X):
        if self.callable:
            return self.normalizer(X)
        return self.normalizer.transform(X.reshape(-1, 1)).flatten()


def _scatter_ragged(flat_values, lens, maxlen, fill, pad_pre, trunc_pre,
                    dtype=np.int32):
    """Scatter a concatenated ragged stream into a dense [N, maxlen]
    matrix in one shot.

    ``flat_values`` holds all rows' values back to back; ``lens[i]`` is
    row i's length. Truncation keeps the last (pre) or first (post)
    ``maxlen`` values; padding fills the front (pre) or back (post)."""
    n = len(lens)
    out = np.full((n, maxlen), fill, dtype=dtype)
    keep = np.minimum(lens, maxlen)
    total = int(keep.sum())
    if total == 0:
        return out
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    rows = np.repeat(np.arange(n), keep)
    # position within each row's kept window, 0..keep[i]-1
    kept_starts = np.concatenate([[0], np.cumsum(keep)[:-1]])
    within = np.arange(total) - np.repeat(kept_starts, keep)
    src_base = starts + (lens - keep if trunc_pre else 0)
    src = np.repeat(src_base, keep) + within
    dst = within + (np.repeat(maxlen - keep, keep) if pad_pre else 0)
    out[rows, dst] = flat_values[src]
    return out


def pad_sequences(sequences, maxlen=None, dtype="int32",
                  padding="pre", truncating="pre", value=0.):
    """Pad a list of lists to a dense [N, maxlen] array
    (keras-contract-equivalent, implemented as one flat scatter)."""
    for arg, name in ((padding, "padding"), (truncating, "truncating")):
        if arg not in ("pre", "post"):
            raise AssertionError("Invalid {}={}.".format(name, arg))
    lens = np.fromiter(map(len, sequences), count=len(sequences),
                       dtype=np.int64)
    if maxlen is None:
        maxlen = int(lens.max()) if len(lens) else 0
    flat = np.fromiter(chain.from_iterable(sequences),
                       count=int(lens.sum()), dtype=dtype)
    return _scatter_ragged(flat, lens, maxlen, value,
                           pad_pre=padding == "pre",
                           trunc_pre=truncating == "pre", dtype=dtype)
