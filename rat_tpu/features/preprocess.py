"""Host-side column encoders: Tokenizer, Normalizer, pad_sequences.

Behavioral contract mirrors the reference (fuxictr/preprocess.py:30-191):

- vocab order is deterministic: tokens sorted by (-count, token), ids
  start at ``1 + oov_token`` (preprocess.py:66,74);
- OOV maps to index 0 (``oov_token``), ``__PAD__`` takes the LAST index
  when padding is enabled (preprocess.py:75-77);
- ``vocab_size`` counts OOV (and PAD when present);
- sequence encode pads/truncates to ``max_len`` with the padding index.
"""

import json
import multiprocessing
import os
from collections import Counter
from concurrent.futures import ProcessPoolExecutor, as_completed

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
    word_counts = Counter()
    max_len = 0
    for text in texts:
        text_split = text.split(splitter)
        max_len = max(max_len, len(text_split))
        for token in text_split:
            word_counts[token] += 1
    return word_counts, max_len


class Tokenizer(object):
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

    def fit_on_texts(self, texts, use_padding=False):
        self.use_padding = use_padding
        word_counts = Counter()
        if self._splitter is not None:  # sequence column
            enc = _fastenc(len(texts))
            if enc is not None:
                cleaned = ["" if (not isinstance(t, str) and pd.isnull(t)) else t
                           for t in texts]
                counts, max_len = enc.count_tokens(cleaned, self._splitter)
                word_counts = Counter(counts)
                if self.max_len == 0:
                    self.max_len = max_len
                self.build_vocab(word_counts)
                return
            # token counting is embarrassingly parallel over row chunks;
            # a 'spawn'-context pool is used (fork after JAX initializes
            # can deadlock) and only pays off for large columns
            if len(texts) >= 200_000 and self.num_workers > 1:
                ctx = multiprocessing.get_context("spawn")
                max_len = 0
                with ProcessPoolExecutor(max_workers=self.num_workers,
                                         mp_context=ctx) as executor:
                    chunks = np.array_split(np.asarray(texts, dtype=object),
                                            self.num_workers)
                    tasks = [executor.submit(count_tokens, chunk, self._splitter)
                             for chunk in chunks]
                    for future in as_completed(tasks):
                        block_word_counts, block_max_len = future.result()
                        word_counts.update(block_word_counts)
                        max_len = max(max_len, block_max_len)
            else:
                word_counts, max_len = count_tokens(list(texts), self._splitter)
            if self.max_len == 0:
                self.max_len = max_len
        else:
            word_counts = Counter(list(texts))
        self.build_vocab(word_counts)

    def build_vocab(self, word_counts):
        # sort by (-count, token) to guarantee deterministic index order
        word_counts = sorted(word_counts.items(), key=lambda x: (-x[1], x[0]))
        words = []
        for token, count in word_counts:
            if count >= self._min_freq:
                if self._na_value is None or token != self._na_value:
                    words.append(token.lower() if self._lower else token)
        if self._num_words:
            words = words[0:self._num_words]
        self.vocab = dict((token, idx) for idx, token in enumerate(words, 1 + self.oov_token))
        self.vocab["__OOV__"] = self.oov_token
        if self.use_padding:
            self.vocab["__PAD__"] = len(words) + self.oov_token + 1  # last index
        self.vocab_size = len(self.vocab) + self.oov_token

    def encode_category(self, categories):
        enc = _fastenc(len(categories))
        # native path pays off only for string columns (it stringifies
        # keys and queries identically; Python dict probes on interned
        # strings are already C-speed, but the C++ map skips the
        # per-item refcount/hash overhead on large columns)
        if enc is not None and len(categories) and isinstance(
                next(iter(self.vocab)), str):
            return np.array(enc.encode_category(
                list(categories), self.vocab, self.oov_token))
        category_indices = [self.vocab.get(x, self.oov_token) for x in categories]
        return np.array(category_indices)

    def encode_sequence(self, texts):
        enc = _fastenc(len(texts))
        if enc is not None:
            cleaned = ["" if (not isinstance(t, str) and pd.isnull(t)) else t
                       for t in texts]
            rows = enc.encode_sequences(
                cleaned, self.vocab,
                self.oov_token, self._splitter, self.max_len,
                self.vocab_size - 1, self.padding == "pre",
                self.padding == "pre")
            return np.array(rows, dtype="int32")
        sequence_list = []
        for text in texts:
            if pd.isnull(text) or text == "":
                sequence_list.append([])
            else:
                sequence_list.append([self.vocab.get(x, self.oov_token)
                                      for x in text.split(self._splitter)])
        sequence_list = pad_sequences(sequence_list, maxlen=self.max_len,
                                      value=self.vocab_size - 1,
                                      padding=self.padding, truncating=self.padding)
        return np.array(sequence_list)

    def load_pretrained_embedding(self, feature_name, pretrain_path, embedding_dim,
                                  output_path, feature_dtype=str, freeze_emb=True):
        """Merge pretrained keys into the vocab and export the aligned
        embedding matrix to h5 (reference: preprocess.py:95-120)."""
        with h5py.File(pretrain_path, "r") as hf:
            keys = hf["key"][:]
            keys = keys.astype(feature_dtype)
            pretrained_vocab = dict(zip(keys, range(len(keys))))
            pretrained_emb = hf["value"][:]
        num_new_words = 0
        for word in pretrained_vocab.keys():
            if word not in self.vocab:
                self.vocab[word] = self.vocab.get("__PAD__", self.vocab_size) + num_new_words
                num_new_words += 1
        self.vocab_size += num_new_words
        if freeze_emb:
            embedding_matrix = np.zeros((self.vocab_size, embedding_dim))
        else:
            embedding_matrix = np.random.normal(loc=0, scale=1.e-4,
                                                size=(self.vocab_size, embedding_dim))
        if "__PAD__" in self.vocab:
            self.vocab["__PAD__"] = self.vocab_size - 1
            embedding_matrix[-1, :] = 0
        for word in pretrained_vocab.keys():
            embedding_matrix[self.vocab[word]] = pretrained_emb[pretrained_vocab[word]]
        os.makedirs(os.path.dirname(output_path), exist_ok=True)
        with h5py.File(output_path, "w") as hf:
            hf.create_dataset(feature_name, data=embedding_matrix)

    def load_vocab_from_file(self, vocab_file):
        with open(vocab_file, "r") as fid:
            word_counts = json.load(fid)
        self.build_vocab(word_counts)

    def set_vocab(self, vocab):
        self.vocab = vocab
        self.vocab_size = len(self.vocab) + self.oov_token


class Normalizer(object):
    def __init__(self, normalizer):
        if not callable(normalizer):
            self.callable = False
            if normalizer in ["StandardScaler", "MinMaxScaler"]:
                self.normalizer = getattr(sklearn_preprocess, normalizer)()
            else:
                raise NotImplementedError("normalizer={}".format(normalizer))
        else:
            self.normalizer = normalizer
            self.callable = True

    def fit(self, X):
        if not self.callable:
            self.normalizer.fit(X.reshape(-1, 1))

    def normalize(self, X):
        if self.callable:
            return self.normalizer(X)
        else:
            return self.normalizer.transform(X.reshape(-1, 1)).flatten()


def pad_sequences(sequences, maxlen=None, dtype="int32",
                  padding="pre", truncating="pre", value=0.):
    """Pad a list of lists to a dense [N, maxlen] array (keras-equivalent)."""
    assert padding in ["pre", "post"], "Invalid padding={}.".format(padding)
    assert truncating in ["pre", "post"], "Invalid truncating={}.".format(truncating)
    if maxlen is None:
        maxlen = max(len(x) for x in sequences)
    arr = np.full((len(sequences), maxlen), value, dtype=dtype)
    for idx, x in enumerate(sequences):
        if len(x) == 0:
            continue
        if truncating == "pre":
            trunc = x[-maxlen:]
        else:
            trunc = x[:maxlen]
        trunc = np.asarray(trunc, dtype=dtype)
        if padding == "pre":
            arr[idx, -len(trunc):] = trunc
        else:
            arr[idx, :len(trunc)] = trunc
    return arr
