"""Optimizer construction and regularizer parsing.

Reference semantics (fuxictr/pytorch/torch_utils.py:41-81,
base_model.py:79-94,224):

- Adam with torch defaults (betas 0.9/0.999, eps 1e-8, bias-corrected)
  == optax.adam defaults;
- global-norm gradient clipping at 10 BEFORE the optimizer update;
- regularizers are LOSS TERMS ``(lambda/p) * ||w||_p^p`` (coupled into
  Adam's moments, not decoupled weight decay), split embedding-vs-net
  by parameter name: any path containing "embedding_layer" is an
  embedding parameter (the reference's substring test, which also
  captures label_embedding_layer and the LR tower's internal table);
- the learning rate is injected as a mutable hyperparameter so the
  LR-on-plateau schedule can decay it without rebuilding opt state.
"""

import jax
import jax.numpy as jnp
import optax


def get_optimizer(optimizer, lr, max_gradient_norm=10.):
    if isinstance(optimizer, str):
        name = optimizer.lower()
    else:
        raise NotImplementedError("optimizer={} is not supported.".format(optimizer))
    factories = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "adagrad": optax.adagrad,
        "rmsprop": optax.rmsprop,
    }
    if name not in factories:
        raise NotImplementedError("optimizer={} is not supported.".format(optimizer))
    opt = optax.inject_hyperparams(factories[name])(learning_rate=lr)
    if max_gradient_norm is not None and max_gradient_norm > 0:
        return optax.chain(optax.clip_by_global_norm(max_gradient_norm), opt)
    return opt


def _inject_state(opt_state):
    """Locate the InjectHyperparamsState whether or not the optimizer is
    chained behind gradient clipping."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    for part in opt_state:
        if hasattr(part, "hyperparams"):
            return part
    raise ValueError("no injected-hyperparams state found in opt_state")


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate in place."""
    inner = _inject_state(opt_state)
    inner.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=inner.hyperparams["learning_rate"].dtype)
    return opt_state


def get_learning_rate(opt_state):
    return float(_inject_state(opt_state).hyperparams["learning_rate"])


def get_regularizer(reg):
    """Parse 'l2(1.e-4)' / 'l1_l2(a,b)' / float -> [(p_norm, weight)]."""
    reg_pair = []
    if isinstance(reg, (int, float)):
        if reg != 0:
            reg_pair.append((2, float(reg)))
    elif isinstance(reg, str):
        try:
            if reg.startswith("l1(") or reg.startswith("l2("):
                reg_pair.append((int(reg[1]), float(reg.rstrip(")").split("(")[-1])))
            elif reg.startswith("l1_l2"):
                l1_reg, l2_reg = reg.rstrip(")").split("(")[-1].split(",")
                reg_pair.append((1, float(l1_reg)))
                reg_pair.append((2, float(l2_reg)))
            else:
                raise NotImplementedError
        except Exception:
            raise NotImplementedError("regularizer={} is not supported.".format(reg))
    elif reg is not None:
        raise NotImplementedError("regularizer={} is not supported.".format(reg))
    return reg_pair


def is_embedding_param(path):
    """The reference's substring test (base_model.py:86)."""
    joined = ".".join(str(p) for p in path)
    return "embedding_layer" in joined


def regularization_loss(params, embedding_reg, net_reg):
    """sum over params of (lambda/p) * ||w||_p^p, split by name."""
    emb_pairs = get_regularizer(embedding_reg)
    net_pairs = get_regularizer(net_reg)
    if not emb_pairs and not net_pairs:
        return 0.0

    def one(path, w):
        path_names = tuple(getattr(k, "key", str(k)) for k in path)
        pairs = emb_pairs if is_embedding_param(path_names) else net_pairs
        total = 0.0
        for p, lam in pairs:
            if p == 2:
                total += (lam / 2) * jnp.sum(w * w)
            elif p == 1:
                total += lam * jnp.sum(jnp.abs(w))
            else:
                total += (lam / p) * jnp.sum(jnp.abs(w) ** p)
        return total

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return sum(one(path, w) for path, w in leaves)
