"""Packed embedding stack.

TPU-native re-design of the reference's per-field ``nn.ModuleDict`` of
``nn.Embedding`` tables (fuxictr/pytorch/layers/embedding.py:26-178).
Instead of F separate lookups, all fields share ONE packed
[total_rows, d] table with static per-field row offsets; a forward pass
issues a single fused gather over every token column (categorical
fields contribute one token, sequence fields ``max_len`` tokens), then
pools sequence spans. This keeps the lookup a single large XLA gather —
the layout that also row-shards cleanly across a device mesh
(rat_tpu.parallel).

Reference semantics preserved:
- ``share_embedding`` fields alias the owner's rows (embedding.py:70-73);
- padding ids embed to exact zeros and receive no gradient (torch
  ``padding_idx`` contract) — enforced here by masking the gathered
  vectors with ``id != padding_idx``;
- sequence encoders MaskedAveragePooling / MaskedSumPooling
  (layers/sequence.py:21-40); the average divides by the count of
  non-padding tokens (the reference counts non-zero embedding entries
  per dimension, which is equivalent unless a learned weight is exactly
  zero);
- numeric fields use a per-field d-vector (torch ``Linear(1, d)``);
- pretrained tables load into their rows, optionally frozen
  (embedding.py:123-136).
"""

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import flax.linen as nn
import h5py
import jax
import jax.numpy as jnp
import numpy as np

from .initializers import xavier_normal


@dataclass(frozen=True)
class _FieldSpec:
    name: str
    kind: str                 # 'token' | 'seq' | 'numeric'
    token_slots: tuple        # slot positions in the packed token matrix
    x_cols: tuple             # column indices into the raw X matrix
    padding_idx: int          # local padding id, or -1
    encoder: Optional[str]    # pooling for sequences
    frozen: bool
    hook: bool                # pretrained-dim -> model-dim projection
    table_dim: int


@dataclass
class EmbeddingSpec:
    """Static layout compiled from a FeatureMap (host-side, hashable)."""
    fields: List[_FieldSpec]
    total_rows: int
    token_cols: np.ndarray       # [T] X columns feeding the packed gather
    token_offsets: np.ndarray    # [T] per-token table row offsets
    token_padding: np.ndarray    # [T] local padding id or -1
    numeric_cols: np.ndarray     # [n_num] X columns of numeric fields
    num_fields: int
    pretrained: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def build(feature_map, embedding_dim, use_pretrain=True,
              required_feature_columns=(), not_required_feature_columns=(),
              force_dim=None, use_sharing=True):
        """force_dim overrides every field dim (the LR one-hot trick uses 1,
        layers/shallow.py:30). use_sharing=False gives every field its own
        rows even when share_embedding is set (the v2-style API knob,
        feature_embedding.py:82-84)."""
        offsets = {}
        total_rows = 0
        fields = []
        token_cols, token_offsets, token_padding = [], [], []
        numeric_cols = []
        pretrained = {}
        slot = 0
        for name, spec in feature_map.feature_specs.items():
            if required_feature_columns and name not in required_feature_columns:
                continue
            if name in not_required_feature_columns:
                continue
            ftype = spec["type"]
            if ftype == "numeric":
                numeric_cols.append(spec["index"])
                fields.append(_FieldSpec(name, "numeric", (), (spec["index"],),
                                         -1, None, False, False, embedding_dim))
                continue
            owner = spec.get("share_embedding", name) \
                if (use_pretrain and use_sharing) else name
            feat_dim = force_dim if force_dim is not None \
                else spec.get("embedding_dim", embedding_dim)
            has_pretrained = use_pretrain and "pretrained_emb" in spec
            hook = has_pretrained and feat_dim != embedding_dim
            if hook:
                # pretrained width != model width: the field gets its own
                # [vocab, feat_dim] side table + a projection Dense
                # (reference embedding_hooks, embedding.py:66-67); it
                # cannot live in the uniform-width packed table
                assert "share_embedding" not in spec, \
                    "share_embedding with a hooked pretrained dim is unsupported"
                pretrained[name] = {"file": spec["pretrained_emb"],
                                    "offset": None, "side": True,
                                    "rows": spec["vocab_size"],
                                    "feat_dim": feat_dim,
                                    "freeze": spec.get("freeze_emb", True)}
                base = -1
            else:
                if owner not in offsets:
                    offsets[owner] = total_rows
                    owner_spec = feature_map.feature_specs[owner]
                    total_rows += owner_spec["vocab_size"]
                base = offsets[owner]
                if has_pretrained:
                    pretrained[name] = {
                        "file": spec["pretrained_emb"], "offset": base,
                        "side": False,
                        "rows": feature_map.feature_specs[owner]["vocab_size"],
                        "freeze": spec.get("freeze_emb", True)}
            if ftype == "categorical":
                pad = spec.get("padding_idx", -1)
                if pad is None:
                    pad = -1
                kind = "side_token" if hook else "token"
                fields.append(_FieldSpec(name, kind, (slot,) if not hook else (),
                                         (spec["index"],),
                                         pad, None, has_pretrained and
                                         spec.get("freeze_emb", True), hook, feat_dim))
                if not hook:
                    token_cols.append(spec["index"])
                    token_offsets.append(base)
                    token_padding.append(pad)
                    slot += 1
            elif ftype == "sequence":
                pad = spec["vocab_size"] - 1
                idxs = tuple(spec["index"])
                kind = "side_seq" if hook else "seq"
                slots = tuple(range(slot, slot + len(idxs))) if not hook else ()
                fields.append(_FieldSpec(name, kind, slots, idxs, pad,
                                         spec.get("encoder", "MaskedAveragePooling"),
                                         has_pretrained and spec.get("freeze_emb", True),
                                         hook, feat_dim))
                if not hook:
                    token_cols.extend(idxs)
                    token_offsets.extend([base] * len(idxs))
                    token_padding.extend([pad] * len(idxs))
                    slot += len(idxs)
            else:
                raise NotImplementedError("feature type={}".format(ftype))
        return EmbeddingSpec(fields=fields, total_rows=total_rows,
                             token_cols=np.asarray(token_cols, np.int32),
                             token_offsets=np.asarray(token_offsets, np.int32),
                             token_padding=np.asarray(token_padding, np.int32),
                             numeric_cols=np.asarray(numeric_cols, np.int32),
                             num_fields=len(fields),
                             pretrained=pretrained)

    def init_table(self, key, embedding_dim, data_dir=None, std=1.e-4):
        """N(0, std) rows, padding rows zero, pretrained rows loaded."""
        table = std * jax.random.normal(key, (self.total_rows, embedding_dim))
        pad_rows = self.token_offsets + self.token_padding
        pad_rows = np.unique(pad_rows[self.token_padding >= 0])
        if len(pad_rows):
            table = table.at[pad_rows].set(0.0)
        for name, info in self.pretrained.items():
            if info.get("side"):
                continue  # hooked fields live in their own side table
            path = os.path.join(data_dir or ".", info["file"])
            with h5py.File(path, "r") as hf:
                emb = np.asarray(hf[name][:], dtype=np.float32)
            table = table.at[info["offset"]: info["offset"] + info["rows"]].set(emb)
        return table

    def init_side_table(self, key, name, data_dir=None, std=1.e-4):
        info = self.pretrained[name]
        with h5py.File(os.path.join(data_dir or ".", info["file"]), "r") as hf:
            return jnp.asarray(np.asarray(hf[name][:], dtype=np.float32))


class PackedEmbedding(nn.Module):
    """X [..., input_length] -> feature embeddings [..., F, d]."""
    spec: EmbeddingSpec
    embedding_dim: int
    data_dir: Optional[str] = None
    init_std: float = 1.e-4

    @nn.compact
    def __call__(self, X_tokens, X_numeric=None):
        spec = self.spec
        table = self.param(
            "table",
            lambda key, _: spec.init_table(key, self.embedding_dim,
                                           self.data_dir, self.init_std),
            (spec.total_rows, self.embedding_dim))
        ids_local = X_tokens[..., spec.token_cols]                      # [..., T]
        ids = ids_local + jnp.asarray(spec.token_offsets)
        emb = jnp.take(table, ids, axis=0)                              # [..., T, d]
        pad = jnp.asarray(spec.token_padding)
        mask = (ids_local != pad[None, :]) | (pad[None, :] < 0)
        emb = emb * mask[..., None]

        if spec.numeric_cols.size:
            num_w = self.param("numeric_weights", xavier_normal,
                               (len(spec.numeric_cols), self.embedding_dim))
            num_vals = X_numeric[..., spec.numeric_cols]

        outputs = []
        for f in spec.fields:
            if f.kind == "numeric":
                pos = int(np.where(spec.numeric_cols == f.x_cols[0])[0][0])
                outputs.append(num_vals[..., pos, None] * num_w[pos])
            elif f.kind in ("side_token", "side_seq"):
                # pretrained field with its own width: separate table +
                # projection hook (reference embedding_hooks,
                # embedding.py:66-67,175-176)
                side = self.param(
                    f"side_{f.name}",
                    lambda key, _: spec.init_side_table(key, f.name,
                                                        self.data_dir,
                                                        self.init_std),
                    None)
                ids = X_tokens[..., f.x_cols[0]] if f.kind == "side_token" \
                    else X_tokens[..., list(f.x_cols)]
                vecs = jnp.take(side, ids, axis=0)
                if f.padding_idx >= 0:
                    m = (ids != f.padding_idx)
                    vecs = vecs * m[..., None]
                if f.frozen:
                    vecs = jax.lax.stop_gradient(vecs)
                if f.kind == "side_seq":
                    if f.encoder == "MaskedSumPooling":
                        vecs = jnp.sum(vecs, axis=-2)
                    elif f.encoder == "MaskedAveragePooling":
                        cnt = jnp.sum(ids != f.padding_idx, axis=-1,
                                      keepdims=True)
                        vecs = jnp.sum(vecs, axis=-2) / (cnt + 1e-16)
                    else:
                        raise RuntimeError("sequence encoder={} is not "
                                           "supported.".format(f.encoder))
                vec = nn.Dense(self.embedding_dim, use_bias=False,
                               kernel_init=xavier_normal,
                               name=f"hook_{f.name}")(vecs)
                outputs.append(vec)
            else:
                vecs = emb[..., f.token_slots[0]: f.token_slots[-1] + 1, :]
                if f.frozen:
                    vecs = jax.lax.stop_gradient(vecs)
                if f.kind == "token":
                    vec = vecs[..., 0, :]
                else:  # sequence pooling
                    if f.encoder in (None, "none", "null"):
                        vec = vecs  # un-pooled [..., max_len, d]
                    elif f.encoder == "MaskedSumPooling":
                        vec = jnp.sum(vecs, axis=-2)
                    elif f.encoder == "MaskedAveragePooling":
                        m = mask[..., f.token_slots[0]: f.token_slots[-1] + 1]
                        cnt = jnp.sum(m, axis=-1, keepdims=True)
                        vec = jnp.sum(vecs, axis=-2) / (cnt + 1e-16)
                    else:
                        raise RuntimeError("sequence encoder={} is not supported."
                                           .format(f.encoder))
                outputs.append(vec)
        return jnp.stack(outputs, axis=-2)


class MergedEmbeddingLayer(nn.Module):
    """One big table over the concatenated vocab, xavier-uniform init —
    expects globally-offset ids (embedding.py:181-194; pair with
    rat_tpu.data.graph.PETGraphProcessor.convert_indices)."""
    feature_map: Any
    embedding_dim: int

    @nn.compact
    def __call__(self, X):
        num_embedding = sum(spec["vocab_size"] for spec
                            in self.feature_map.feature_specs.values())
        table = self.param("table", nn.initializers.variance_scaling(
            1.0, "fan_avg", "uniform"), (num_embedding, self.embedding_dim))
        return jnp.take(table, X, axis=0)


class LabelEmbedding(nn.Module):
    """3-entry label table: 0/1 = labels, 2 = [MASK] for the target
    (RAT_m2.py:64-65,115). torch's plain nn.Embedding default init is
    N(0,1) and the reference never re-initializes it."""
    embedding_dim: int

    @nn.compact
    def __call__(self, labels):
        table = self.param("table", nn.initializers.normal(stddev=1.0),
                           (3, self.embedding_dim))
        return jnp.take(table, labels, axis=0)
