"""Fused fast-forward path for the default RAT (m2) variant.

Mirrors RATModel.__call__ math (models/rat.py) but runs each encoder
block through the Pallas fused kernel
(rat_tpu.ops.pallas.cross_intra_block) operating directly on the
parameter pytree. Enabled by ``use_pallas: true`` in the model config;
the Trainer routes through here when the variant is 'default',
dropout is 0 and batch_norm is off (the kernel has no dropout/BN).

On non-TPU backends the same math runs through the jnp reference
(cross_intra_block_reference) so numerics and tests are identical
everywhere; the pallas_call engages only under a TPU backend.
"""

import jax
import jax.numpy as jnp

from ..ops.pallas.cross_intra_block import (cross_intra_block_reference,
                                            fused_cross_intra_block)


def _block_params(p, i, project_out):
    """project_out mirrors the flax Attention: the output projection is
    omitted when heads == 1 and dim_head == dim (RAT_m0.py:167); the
    kernel then receives zero-sized placeholders it never reads."""
    blk = p["encoder"][f"CrossIntraEncoderBlock_{i}"]
    intra = blk["intra_attention"]["Attention_0"]
    cross = blk["cross_attention"]["Attention_0"]

    def out_kernel(attn):
        if project_out:
            return attn["to_out"]["kernel"], attn["to_out"]["bias"]
        d = attn["to_qkv"]["kernel"].shape[0]
        return jnp.zeros((d, d)), jnp.zeros((d,))

    w_out1, b_out1 = out_kernel(intra)
    w_out2, b_out2 = out_kernel(cross)
    return {
        "ln1_scale": blk["intra_attention"]["LayerNorm_0"]["scale"],
        "ln1_bias": blk["intra_attention"]["LayerNorm_0"]["bias"],
        "w_qkv1": intra["to_qkv"]["kernel"],
        "w_out1": w_out1,
        "b_out1": b_out1,
        "ln2_scale": blk["cross_attention"]["LayerNorm_0"]["scale"],
        "ln2_bias": blk["cross_attention"]["LayerNorm_0"]["bias"],
        "w_qkv2": cross["to_qkv"]["kernel"],
        "w_out2": w_out2,
        "b_out2": b_out2,
        "ff_w1": blk["mlp"]["Dense_0"]["kernel"],
        "ff_b1": blk["mlp"]["Dense_0"]["bias"],
        "ff_w2": blk["mlp"]["Dense_1"]["kernel"],
        "ff_b2": blk["mlp"]["Dense_1"]["bias"],
    }


def _embed(params, spec, X, X_num=None):
    """PackedEmbedding forward on the raw param tree (embedding.py)."""
    table = params["table"]
    ids_local = X[..., spec.token_cols]
    ids = ids_local + jnp.asarray(spec.token_offsets)
    emb = jnp.take(table, ids, axis=0)
    pad = jnp.asarray(spec.token_padding)
    mask = (ids_local != pad[None, :]) | (pad[None, :] < 0)
    emb = emb * mask[..., None]
    outputs = []
    import numpy as np
    for f in spec.fields:
        if f.kind == "numeric":
            pos = int(np.where(spec.numeric_cols == f.x_cols[0])[0][0])
            outputs.append(X_num[..., f.x_cols[0], None]
                           * params["numeric_weights"][pos])
        elif f.kind == "token":
            outputs.append(emb[..., f.token_slots[0], :])
        else:
            vecs = emb[..., f.token_slots[0]: f.token_slots[-1] + 1, :]
            if f.encoder == "MaskedSumPooling":
                outputs.append(jnp.sum(vecs, axis=-2))
            elif f.encoder == "MaskedAveragePooling":
                m = mask[..., f.token_slots[0]: f.token_slots[-1] + 1]
                cnt = jnp.sum(m, axis=-1, keepdims=True)
                outputs.append(jnp.sum(vecs, axis=-2) / (cnt + 1e-16))
            else:
                raise NotImplementedError(f.encoder)
    return jnp.stack(outputs, axis=-2)


def _mlp(params, x, n_hidden):
    for i in range(n_hidden):
        d = params[f"Dense_{i}"]
        x = jax.nn.relu(x @ d["kernel"] + d["bias"])
    d = params[f"Dense_{n_hidden}"]
    return x @ d["kernel"] + d["bias"]


def rat_m2_fast_forward(params, model, X, y, X_num=None, use_kernel=None,
                        block_b=8):
    """params: RATModel param tree; model: the RATModel instance (for
    static config). Returns {"y_pred", "y_true"} identical to
    model.apply(..., train=False) within float tolerance."""
    assert model.variant == "default"
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    spec = model.embedding_spec
    d = model.embedding_dim
    B, T = X.shape[:2]
    F = model.num_fields

    feature_emb = _embed(params["embedding_layer"], spec, X, X_num)
    label_ids = jnp.concatenate(
        [jnp.full((B, 1), 2, dtype=jnp.int32), y[:, 1:].astype(jnp.int32)],
        axis=1)
    label_emb = jnp.take(params["label_embedding_layer"]["table"],
                         label_ids, axis=0)[:, :, None, :]
    grid = jnp.concatenate([label_emb, feature_emb], axis=2)

    # pad the batch to a block multiple for the kernel grid
    pad_b = (-B) % block_b if use_kernel else 0
    if pad_b:
        grid = jnp.concatenate(
            [grid, jnp.zeros((pad_b,) + grid.shape[1:], grid.dtype)], axis=0)
    project_out = not (model.num_heads == 1 and model.dim_head == d)
    for i in range(model.depth):
        bp = _block_params(params, i, project_out)
        if use_kernel:
            grid = fused_cross_intra_block(grid, bp, model.num_heads,
                                           model.dim_head,
                                           project_out=project_out,
                                           block_b=block_b)
        else:
            grid = cross_intra_block_reference(grid, bp, model.num_heads,
                                               model.dim_head,
                                               project_out=project_out)
    if pad_b:
        grid = grid[:B]

    cls = grid[:, 0, 0]
    y_pred = cls @ params["fc"]["kernel"] + params["fc"]["bias"]
    if model.dnn_hidden_units:
        target_emb = feature_emb[:, 0].reshape(B, F * d)
        y_pred += _mlp(params["dnn"], target_emb,
                       len(model.dnn_hidden_units))
    if model.use_wide:
        # target-only wide tower: reference slices X[:, 0] -> Bx1xF before
        # the LR layer (RAT_m2.py:114,119,148)
        lr_tab = params["lr_layer"]["embedding_layer"]
        weights = _embed(lr_tab, model.lr_spec, X[:, 0:1],
                         None if X_num is None else X_num[:, 0:1])
        y_pred += jnp.mean(jnp.sum(weights, axis=-2), axis=1)
    y_pred = jax.nn.sigmoid(y_pred)
    return {"y_pred": y_pred, "y_true": y[:, 0:1]}
