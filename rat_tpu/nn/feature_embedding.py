"""FuxiCTR-v2-style feature embedding API.

Functional equivalent of the reference's newer-API duplicate
``FeatureEmbedding`` / ``FeatureEmbeddingDict``
(fuxictr/pytorch/layers/feature_embedding.py:29-216): per-feature
embedding dict with call-time ``feature_source`` / ``feature_type``
filtering, per-field ``embedding_dim`` overrides (``dynamic_emb_dim``
concat), declarative per-field ``feature_encoder`` specs, required /
not-required column filters, ``use_pretrain`` / ``use_sharing`` knobs,
and the dim-1 LR fallback (feature_embedding.py:72-75).

TPU-first redesign: fields are grouped by their resolved embedding dim
and each group shares ONE packed table with a single fused gather
(the PackedEmbedding layout, see embedding.py), instead of one
``nn.Embedding`` module per field. The dict view is sliced out of the
group gathers, so a model reading 30 fields still issues a handful of
large gathers rather than 30 small ones.

``feature_encoder`` strings are parsed into a closed registry
(MaskedAveragePooling / MaskedSumPooling / KMaxPooling / Linear) by a
literal-argument AST walk — deliberately NOT the reference's ``eval``
(feature_embedding.py:114-125), which executes arbitrary config text.

Like the reference (feature_embedding.py:162-163), pretrained tables
must match the field's embedding dim — the projection-hook path lives
only in the v1-style ``PackedEmbedding``.
"""

import ast
import re
from collections import OrderedDict
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention_lib import k_max_pooling
from .embedding import EmbeddingSpec
from .initializers import xavier_normal

_ENCODERS = ("MaskedAveragePooling", "MaskedSumPooling", "KMaxPooling",
             "Linear")


def parse_feature_encoder(expr):
    """Parse one encoder spec string into (name, args, kwargs).

    Accepts the reference config forms (``layers.MaskedAveragePooling()``,
    ``nn.Linear(40, 10, bias=False)``, ``layers.KMaxPooling(2, dim=1)``)
    but only literal arguments and only the registry above — anything
    else raises ValueError instead of executing.
    """
    try:
        node = ast.parse(expr.strip(), mode="eval").body
    except SyntaxError as e:
        raise ValueError("feature_encoder={} is not supported.".format(expr)) from e
    if not isinstance(node, ast.Call):
        raise ValueError("feature_encoder={} is not supported.".format(expr))
    func = node.func
    name = func.attr if isinstance(func, ast.Attribute) else getattr(func, "id", None)
    if name not in _ENCODERS:
        raise ValueError("feature_encoder={} is not supported.".format(expr))
    try:
        args = tuple(ast.literal_eval(a) for a in node.args)
        kwargs = {k.arg: ast.literal_eval(k.value) for k in node.keywords}
    except (ValueError, SyntaxError) as e:
        raise ValueError("feature_encoder={} must use literal arguments"
                         .format(expr)) from e
    return (name, args, kwargs)


def _parse_encoders(spec):
    """feature_encoder spec (string or list of strings) -> tuple of
    parsed encoder descriptors, applied in order (the reference chains a
    list into nn.Sequential, feature_embedding.py:116-120)."""
    if spec is None:
        return ()
    if isinstance(spec, (list, tuple)):
        return tuple(parse_feature_encoder(s) for s in spec)
    return (parse_feature_encoder(spec),)


def _init_std(embedding_initializer):
    """The reference threads a ``partial(nn.init.normal_, std=...)``
    eval-string through get_initializer (feature_embedding.py:33,128);
    here only the normal family is meaningful — extract its std."""
    if embedding_initializer is None:
        return 1e-4
    if isinstance(embedding_initializer, (int, float)):
        return float(embedding_initializer)
    m = re.search(r"std\s*=\s*([0-9.eE+-]+)", str(embedding_initializer))
    if m is None:
        raise ValueError("embedding_initializer={} is not supported "
                         "(use partial(nn.init.normal_, std=S) or a float std)"
                         .format(embedding_initializer))
    return float(m.group(1))


class FeatureEmbeddingDict(nn.Module):
    """X [..., input_length] -> OrderedDict{feature: [..., d_f] (or
    [..., L, d_f] for un-encoded sequence fields)}."""
    feature_map: Any
    embedding_dim: int
    embedding_initializer: Any = "partial(nn.init.normal_, std=1e-4)"
    required_feature_columns: Tuple[str, ...] = ()
    not_required_feature_columns: Tuple[str, ...] = ()
    use_pretrain: bool = True
    use_sharing: bool = True
    data_dir: Optional[str] = None

    def _entries(self):
        """(name, ftype, resolved dim, encoder chain) per embedded field,
        in feature_map order. The dim-1 LR fallback forces every field to
        one dim and sum-pools sequences (feature_embedding.py:72-75)."""
        lr_mode = (not (self.use_pretrain and self.use_sharing)
                   and self.embedding_dim == 1)
        entries = []
        for name, spec in self.feature_map.feature_specs.items():
            if spec["type"] == "meta":
                continue
            if self.required_feature_columns and \
                    name not in self.required_feature_columns:
                continue
            if name in (self.not_required_feature_columns or ()):
                continue
            if lr_mode:
                dim = 1
                encoders = (("MaskedSumPooling", (), {}),) \
                    if spec["type"] == "sequence" else ()
            else:
                dim = spec.get("embedding_dim", self.embedding_dim)
                encoders = _parse_encoders(spec.get("feature_encoder"))
            entries.append((name, spec["type"], dim, encoders))
        return entries, lr_mode

    def _apply_encoder(self, emb, enc, layer_name):
        name, args, kwargs = enc
        if name == "MaskedSumPooling":
            return jnp.sum(emb, axis=-2)
        if name == "MaskedAveragePooling":
            # the reference counts non-zero embedding entries per dim
            # (sequence.py:26-28); padding rows embed to exact zeros
            cnt = jnp.sum(emb != 0, axis=-2)
            return jnp.sum(emb, axis=-2) / (cnt + 1e-16)
        if name == "KMaxPooling":
            k = kwargs.get("k", args[0] if args else 1)
            dim = kwargs.get("dim", args[1] if len(args) > 1 else -2)
            if dim >= 0:
                # reference configs write the axis against a 3-D
                # [B, L, D] input (sequence.py:41); here the sequence
                # span can be higher-rank ([B, 1+K, L, D] under the RAT
                # grid), so anchor non-negative axes from the right
                dim -= 3
            return k_max_pooling(emb, k, axis=dim)
        assert name == "Linear"
        # torch nn.Linear(in, out, bias=...): in_features is inferred
        out = kwargs.get("out_features", args[1] if len(args) > 1 else args[0])
        bias = kwargs.get("bias", args[2] if len(args) > 2 else True)
        return nn.Dense(out, use_bias=bias, kernel_init=xavier_normal,
                        name=layer_name)(emb)

    @nn.compact
    def __call__(self, X_tokens, X_numeric=None, feature_source=(),
                 feature_type=()):
        if not isinstance(feature_source, (list, tuple)):
            feature_source = [feature_source]
        if not isinstance(feature_type, (list, tuple)):
            feature_type = [feature_type]
        entries, lr_mode = self._entries()
        std = _init_std(self.embedding_initializer)

        # one packed table + one gather per embedding-dim group
        groups = OrderedDict()
        for name, ftype, dim, _ in entries:
            groups.setdefault(dim, []).append(name)
        gathered = {}
        for dim, names in groups.items():
            spec = EmbeddingSpec.build(
                self.feature_map, dim, use_pretrain=self.use_pretrain,
                required_feature_columns=tuple(names),
                use_sharing=self.use_sharing,
                force_dim=1 if lr_mode else None)
            bad = [f.name for f in spec.fields if f.kind.startswith("side")]
            if bad:
                # reference parity: pretrained dims must match
                # (feature_embedding.py:162-163)
                raise ValueError(
                    "{}'s embedding_dim is not correctly set to match its "
                    "pretrained_emb shape".format(bad[0]))
            table = self.param(
                "table_d{}".format(dim),
                lambda key, _, spec=spec, dim=dim: spec.init_table(
                    key, dim, self.data_dir, std),
                (spec.total_rows, dim))
            ids_local = X_tokens[..., spec.token_cols]
            ids = ids_local + jnp.asarray(spec.token_offsets)
            emb = jnp.take(table, ids, axis=0)
            pad = jnp.asarray(spec.token_padding)
            mask = (ids_local != pad[None, :]) | (pad[None, :] < 0)
            emb = emb * mask[..., None]
            num_w = None
            if spec.numeric_cols.size:
                num_w = self.param("numeric_weights_d{}".format(dim),
                                   xavier_normal,
                                   (len(spec.numeric_cols), dim))
            gathered[dim] = (spec, emb, num_w)

        enc_by_name = {name: (ftype, dim, encoders)
                       for name, ftype, dim, encoders in entries}
        out = OrderedDict()
        for dim, (spec, emb, num_w) in gathered.items():
            for f in spec.fields:
                ftype, _, encoders = enc_by_name[f.name]
                if f.kind == "numeric":
                    pos = int(np.where(spec.numeric_cols == f.x_cols[0])[0][0])
                    vec = X_numeric[..., spec.numeric_cols[pos], None] \
                        * num_w[pos]
                elif f.kind == "token":
                    vec = emb[..., f.token_slots[0], :]
                else:  # un-pooled sequence span; encoders pool/transform it
                    vec = emb[..., f.token_slots[0]: f.token_slots[-1] + 1, :]
                if f.frozen:
                    vec = jax.lax.stop_gradient(vec)
                for i, enc in enumerate(encoders):
                    vec = self._apply_encoder(vec, enc,
                                              "enc_{}_{}".format(f.name, i))
                out[f.name] = vec

        # call-time source/type filtering happens on the OUTPUT view, so
        # the param structure is independent of the first call's filters
        filtered = OrderedDict()
        for name, fspec in self.feature_map.feature_specs.items():
            if name not in out:
                continue
            if feature_source and fspec.get("source") not in feature_source:
                continue
            if feature_type and fspec["type"] not in feature_type:
                continue
            filtered[name] = out[name]
        return filtered

    def dict2tensor(self, embedding_dict, feature_source=(), feature_type=(),
                    dynamic_emb_dim=False):
        """Dict view -> [..., F, d] stack, or [..., sum(d_f)] concat when
        ``dynamic_emb_dim`` (feature_embedding.py:170-187)."""
        if not isinstance(feature_source, (list, tuple)):
            feature_source = [feature_source]
        if not isinstance(feature_type, (list, tuple)):
            feature_type = [feature_type]
        embs = []
        for name, fspec in self.feature_map.feature_specs.items():
            if feature_source and fspec.get("source") not in feature_source:
                continue
            if feature_type and fspec["type"] not in feature_type:
                continue
            if name in embedding_dict:
                embs.append(embedding_dict[name])
        if dynamic_emb_dim:
            return jnp.concatenate(embs, axis=-1)
        return jnp.stack(embs, axis=-2)


class FeatureEmbedding(nn.Module):
    """Tensor-view wrapper: embed then stack/concat
    (feature_embedding.py:29-50)."""
    feature_map: Any
    embedding_dim: int
    embedding_initializer: Any = "partial(nn.init.normal_, std=1e-4)"
    required_feature_columns: Tuple[str, ...] = ()
    not_required_feature_columns: Tuple[str, ...] = ()
    use_pretrain: bool = True
    use_sharing: bool = True
    data_dir: Optional[str] = None

    @nn.compact
    def __call__(self, X_tokens, X_numeric=None, feature_source=(),
                 feature_type=(), dynamic_emb_dim=False):
        layer = FeatureEmbeddingDict(
            self.feature_map, self.embedding_dim,
            embedding_initializer=self.embedding_initializer,
            required_feature_columns=self.required_feature_columns,
            not_required_feature_columns=self.not_required_feature_columns,
            use_pretrain=self.use_pretrain, use_sharing=self.use_sharing,
            data_dir=self.data_dir, name="embedding_layer")
        emb_dict = layer(X_tokens, X_numeric, feature_source=feature_source,
                         feature_type=feature_type)
        return layer.dict2tensor(emb_dict, feature_source=feature_source,
                                 feature_type=feature_type,
                                 dynamic_emb_dim=dynamic_emb_dim)
