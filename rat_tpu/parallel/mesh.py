"""Device-mesh parallelism layer.

The reference is strictly single-device (SURVEY.md §2.8: no DDP, no
collectives anywhere; fuxictr/pytorch/torch_utils.py:34-39). This module
is therefore a new first-class component, not a port: a 2-D
``(data, model)`` mesh where

- the batch dimension is sharded over ``data`` (pure DP, gradients
  reduced by XLA-inserted psums over ICI);
- embedding tables are ROW-sharded (vocab dim) over ``model``; lookups
  of a row-sharded table by replicated/batch-sharded ids are partitioned
  by the XLA SPMD pass into local gathers + cross-shard combines, i.e.
  the all-to-all embedding exchange is expressed declaratively through
  shardings instead of hand-written NCCL calls;
- dense towers (1-17M params total, SURVEY.md §6) are replicated.

Everything runs under ``jax.jit`` with NamedShardings; the same code
compiles for 1 chip, a v5e slice, or an 8-virtual-device CPU mesh used
by the tests.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec):
    """Normalize a mesh spec to (data_axis, model_axis) or None.

    Accepted forms (the TPU generalization of the reference's ``--gpu``
    index, reference run_expid.py:32):
    - ``"4x2"``          -> (4, 2): data x model
    - ``8`` / ``"8"``    -> (8, 1): pure DP
    - ``{"data": 4, "model": 2}``
    - ``None`` / ``""`` / ``"none"`` -> None (single device)
    """
    if spec is None or spec == "" or str(spec).lower() == "none":
        return None
    if isinstance(spec, dict):
        return int(spec.get("data", 1)), int(spec.get("model", 1))
    text = str(spec).lower()
    if "x" in text:
        data, model = text.split("x", 1)
        return int(data), int(model)
    return int(text), 1


def resolve_mesh(params=None, cli_spec=None):
    """Build the experiment mesh from (in precedence order) an explicit
    CLI spec, the config's ``mesh`` key, or the RAT_TPU_MESH environment
    variable (how autotuner slots schedule topologies). Returns None for
    the default single-device path."""
    import os
    spec = cli_spec
    if spec is None and params is not None:
        spec = params.get("mesh")
    if spec is None:
        spec = os.environ.get("RAT_TPU_MESH")
    axes = parse_mesh_spec(spec)
    if axes is None:
        return None
    data_axis, model_axis = axes
    if data_axis * model_axis <= 1:
        return None
    return make_mesh(n_devices=data_axis * model_axis,
                     model_axis_size=model_axis)


def make_mesh(n_devices=None, model_axis_size=1, devices=None):
    """Build a (data, model) mesh. model_axis_size divides n_devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    assert n % model_axis_size == 0
    dev_array = np.array(devices[:n]).reshape(n // model_axis_size,
                                              model_axis_size)
    return Mesh(dev_array, ("data", "model"))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def embedding_table_shapes(params):
    """Shapes of the row-shardable embedding tables: any 2-D 'table'
    param living under a path containing 'embedding_layer', except the
    3-row label table (too small to shard)."""
    shapes = set()
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        if "table" in names and any("embedding_layer" in n for n in names) \
                and not any("label" in n for n in names) \
                and getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] > 16:
            shapes.add(leaf.shape)
    return shapes


def state_sharding(state, mesh, table_shapes=None):
    """Sharding pytree for a TrainState: embedding-table-shaped leaves
    (params AND their Adam moments) row-sharded over 'model', everything
    else replicated."""
    if table_shapes is None:
        table_shapes = embedding_table_shapes(state.params)
    row = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())

    def rule(leaf):
        if getattr(leaf, "ndim", 0) == 2 and leaf.shape in table_shapes:
            return row
        return rep

    return jax.tree_util.tree_map(rule, state)
