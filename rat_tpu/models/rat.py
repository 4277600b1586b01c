"""The four RAT variants over the shared (1+K) x (F+1) token grid.

Shared input construction (identical in all reference variants,
RAT_m2.py:104-126): embed the target row and its K retrieved neighbor
rows with the per-field tables; embed LABELS with a 3-entry table —
neighbors use their true 0/1 label, the target uses mask token 2 —
and prepend the label embedding as token 0 of every sample.

Shared head (RAT_m2.py:144-150):
``y_pred = fc(CLS) + MLP(target_emb.flatten()) [+ LR(X_target)]``
followed by sigmoid; CLS is grid position [0, 0] (target sample, label
token) after the encoder.

Variants (fuxictr/pytorch/models/__init__.py:1-5):
- RAT_m0 = RAT_JM  joint modeling (flattened grid, one transformer)
- RAT_m1 = RAT_CE  cascaded encoders (intra then cross)
- RAT_m2 = RAT     interleaved cross/intra blocks (default)
- RAT_m3 = RAT_PA  parallel attention with shared query

All variants reject label-wise retrieval at the model level
(RAT_m2.py:112) — the loader may still precompute 2K label-wise
neighbors for parity with the reference caches.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.embedding import EmbeddingSpec, LabelEmbedding, PackedEmbedding
from ..nn.encoders import (CascadeEncoder, CrossIntraEncoder,
                           CrossIntraEncoderPA, JointEncoder)
from ..nn.initializers import xavier_normal
from ..nn.layers import LRLayer, MLPLayer

VARIANTS = {"RAT_m0": "jm", "RAT_m1": "ce", "RAT_m2": "default", "RAT_m3": "pa"}


class RATModel(nn.Module):
    variant: str                       # 'jm' | 'ce' | 'default' | 'pa'
    embedding_spec: EmbeddingSpec
    lr_spec: Optional[EmbeddingSpec]   # one-dim spec for the wide tower
    num_fields: int
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: str = "relu"
    num_heads: int = 1
    dim_head: int = 10
    depth: int = 4
    scale_dim: int = 4
    dropout: float = 0.
    emb_dropout: float = 0.
    net_dropout: float = 0.
    batch_norm: bool = False
    use_wide: bool = False
    data_dir: Optional[str] = None
    # m2 encoder implementation: 'env' | 'stream' | 'grid_minor'
    # (identical parameter tree and math; layout schedule only — the
    # trainer resolves config value 'auto' by on-device probe)
    encoder_impl: str = "env"

    @nn.compact
    def __call__(self, X, y, X_num=None, train: bool = False,
                 nbr_mask=None):
        """X: [B, 1+K, L] int32 token ids (L = input_length), y: [B, 1+K]
        float labels, X_num: optional [B, 1+K, L] float values for
        numeric columns, nbr_mask: optional [B, 1+K] float validity mask
        (corrected ``neighbor_padding="mask"`` mode — the reference
        instead gathers pool row -1, wrapping to the LAST pool row,
        data_generator.py:69). Returns {"y_pred": [B, 1] post-sigmoid,
        "y_true": [B, 1]}."""
        B, T = X.shape[:2]
        F = self.num_fields
        d = self.embedding_dim

        embedding_layer = PackedEmbedding(self.embedding_spec, d,
                                          data_dir=self.data_dir,
                                          name="embedding_layer")
        label_embedding_layer = LabelEmbedding(d, name="label_embedding_layer")

        # dead params kept for parameter-count/checkpoint parity with the
        # reference's unused query_proj (RAT_m2.py:66-70)
        self.param("query_proj_kernel", xavier_normal, (d * F, d * F))
        self.param("query_proj_bias", nn.initializers.zeros, (d * F,))

        feature_emb = embedding_layer(X, X_num)                # [B, T, F, d]
        # label token ids: target -> mask id 2, neighbors -> true labels
        label_ids = jnp.concatenate(
            [jnp.full((B, 1), 2, dtype=jnp.int32),
             y[:, 1:].astype(jnp.int32)], axis=1)              # [B, T]
        label_emb = label_embedding_layer(label_ids)[:, :, None, :]  # [B,T,1,d]
        grid = jnp.concatenate([label_emb, feature_emb], axis=2)  # [B,T,F+1,d]
        if nbr_mask is not None:
            # zero every embedded token (features AND label) of dropped
            # neighbors, so they contribute exactly like the framework's
            # other padding (zeroed padding_idx embedding rows) instead
            # of injecting the pool's last row. The target column is
            # always 1, so the DNN/LR towers (target-only) are
            # untouched by construction.
            grid = grid * nbr_mask[:, :, None, None]
        grid = nn.Dropout(rate=self.emb_dropout,
                          deterministic=not train)(grid)

        hidden_dim = d * self.scale_dim
        if self.variant == "default":
            out = CrossIntraEncoder(d, self.num_heads, self.dim_head,
                                    self.dropout, self.depth, hidden_dim,
                                    impl=self.encoder_impl,
                                    name="encoder")(grid, train=train)
            cls = out[:, 0, 0]
        elif self.variant == "pa":
            out = CrossIntraEncoderPA(d, self.num_heads, self.dim_head,
                                      self.dropout, self.depth, hidden_dim,
                                      impl=self.encoder_impl,
                                      name="encoder")(grid, train=train)
            cls = out[:, 0, 0]
        elif self.variant == "jm":
            out = JointEncoder(d, self.depth, self.num_heads, self.dim_head,
                               hidden_dim, self.dropout,
                               impl=self.encoder_impl)(grid, train=train)
            cls = out[:, 0, 0]
        elif self.variant == "ce":
            out = CascadeEncoder(d, self.depth, self.num_heads, self.dim_head,
                                 hidden_dim, self.dropout,
                                 impl=self.encoder_impl)(grid, train=train)
            cls = out[:, 0]
        else:
            raise NotImplementedError("variant={}".format(self.variant))

        y_pred = nn.Dense(1, kernel_init=xavier_normal, name="fc")(cls)
        if self.dnn_hidden_units:
            target_emb = feature_emb[:, 0].reshape(B, F * d)
            y_pred += MLPLayer(input_dim=F * d, output_dim=1,
                               hidden_units=tuple(self.dnn_hidden_units),
                               hidden_activations=self.dnn_activations,
                               dropout_rates=self.net_dropout,
                               batch_norm=self.batch_norm,
                               name="dnn")(target_emb, train=train)
        if self.use_wide:
            # the reference slices the TARGET row before the wide tower:
            # X = X[:, 0] then unsqueeze(1) -> Bx1xF (RAT_m2.py:114,119,148),
            # so neighbor features never reach the LR logit
            y_pred += LRLayer(self.lr_spec, use_bias=False, name="lr_layer")(
                X[:, 0:1], None if X_num is None else X_num[:, 0:1])
        y_pred = nn.sigmoid(y_pred)
        return {"y_pred": y_pred, "y_true": y[:, 0:1]}


def build_model(feature_map, params):
    """Instantiate a RATModel from a merged experiment config dict."""
    model_name = params["model"]
    if model_name not in VARIANTS:
        raise NotImplementedError("model={} is not supported.".format(model_name))
    embedding_dim = params.get("embedding_dim", 10)
    spec = EmbeddingSpec.build(feature_map, embedding_dim)
    lr_spec = EmbeddingSpec.build(feature_map, 1, use_pretrain=False,
                                  force_dim=1) if params.get("use_wide") else None
    return RATModel(
        variant=VARIANTS[model_name],
        embedding_spec=spec,
        lr_spec=lr_spec,
        num_fields=feature_map.num_fields,
        embedding_dim=embedding_dim,
        dnn_hidden_units=tuple(params.get("dnn_hidden_units", [64, 64, 64]) or ()),
        dnn_activations=params.get("dnn_activations", "relu"),
        num_heads=params.get("num_heads", 1),
        dim_head=params.get("dim_head", 10),
        depth=params.get("depth", 4),
        scale_dim=params.get("scale_dim", 4),
        dropout=params.get("dropout", 0.),
        emb_dropout=params.get("emb_dropout", 0.),
        net_dropout=params.get("net_dropout", 0.),
        batch_norm=params.get("batch_norm", False),
        use_wide=params.get("use_wide", False),
        data_dir=feature_map.data_dir,
        # 'auto' is a trainer-level directive (resolved by probing);
        # at the model level it means 'env' until resolved
        encoder_impl={"auto": "env"}.get(
            params.get("encoder_impl", "auto"),
            params.get("encoder_impl", "env")),
    )
