"""Training runtime: jit train/eval steps + the monitored fit loop.

Re-design of the reference BaseModel runtime
(fuxictr/pytorch/models/base_model.py:31-302). Control-flow parity:

- loss = BCE(forward) + p-norm regularizers split embedding-vs-net by
  parameter name (base_model.py:74-99);
- per-step: total loss -> grads -> clip_by_global_norm(10) -> Adam
  (base_model.py:213-230);
- eval cadence ``every_x_epochs`` (float ok) via on_batch_end
  (base_model.py:144-151);
- checkpoint/early-stop/LR-plateau: monitored metric with
  min_delta=1e-6, save-best-only, patience counted in EVALUATIONS
  scaled by every_x_epochs, ``lr *= 0.1`` floored at 1e-6
  (base_model.py:153-179).

TPU re-design: each split's token/label/neighbor arrays are resident in
HBM; a step receives only a [B] vector of row ids and gathers the
(1+K)x(F+1) grid on device, so there is no per-batch host->device input
stream. The final partial batch is padded and masked (the reference
relies on ragged batches).
"""

import logging
import os
import time
from collections import deque
from functools import partial

import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..metrics import evaluate_metrics
from ..models import build_model
from ..utils import Monitor
from .optim import (get_learning_rate, get_optimizer, regularization_loss,
                    set_learning_rate)


class TrainState(flax.struct.PyTreeNode):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


def _bce(pred, target):
    """torch F.binary_cross_entropy parity: log terms clamped at -100."""
    logp = jnp.maximum(jnp.log(pred), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - pred), -100.0)
    return -(target * logp + (1.0 - target) * log1mp)


def get_loss_fn(loss):
    """Loss factory by config name (torch_utils.py:51-63 semantics)."""
    if isinstance(loss, str):
        name = loss.lower()
        if name in ("bce", "binary_crossentropy", "binary_cross_entropy"):
            return _bce
        if name in ("mse", "mse_loss", "mean_squared_error"):
            return lambda pred, target: (pred - target) ** 2
        if name in ("mae", "l1_loss"):
            return lambda pred, target: jnp.abs(pred - target)
        raise NotImplementedError("loss={} is not supported.".format(loss))
    return loss  # callable


@partial(jax.jit, donate_argnums=(0,))
def _chunk_write(buf, part, lo):
    """In-place (donated) row-slab write for chunked uploads: peak HBM
    is the destination buffer plus ONE chunk, not buffer + all chunks +
    a concatenated copy (the concatenate variant OOMed the shared chip
    at Tmall scale)."""
    start = (lo,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, part, start)


def _gather_batch(data, idx, dedup_neighbors=False):
    """Assemble the [B, 1+K, L] grid from device-resident split arrays.
    Returns (X tokens, y labels, X_num or None, nbr_mask or None —
    the [B, 1+K] validity mask present only under the corrected
    ``neighbor_padding="mask"`` mode, see DataGenerator).

    ``dedup_neighbors`` routes the pool-row gather through
    unique-ids + inverse-gather. MEASURED NEGATIVE and kept only for
    experimentation (r5, scripts/dedup_ab.py --hlo on the 4x2 virtual
    mesh): the compiled step's collective profile with the flag off is
    3 all-reduces (grad psum) and the pool gathers are LOCAL — the pool
    arrays are replicated, and static shapes force the unique buffer to
    full [B*K] capacity, so dedup cannot shrink any sharded operand.
    With the flag on, the sort/unique machinery ADDS 2 all-gathers + 1
    all-reduce and ~8% more HLO. Outputs are identical by construction
    (parity-tested on the 8-device CPU mesh). Off by default.
    """
    Xt = data["tokens"][idx]
    yt = data["labels"][idx]
    Xf = data["numeric"][idx] if "numeric" in data else None
    nmask = None
    if "nbr" in data:
        nb = data["nbr"][idx]
        if "nbr_ok" in data:
            ok = data["nbr_ok"][idx]                       # [B, K]
            nmask = jnp.concatenate(
                [jnp.ones((ok.shape[0], 1), ok.dtype), ok], axis=1)

        def pool_gather(pool):
            if not dedup_neighbors:
                return pool[nb]
            flat = nb.reshape(-1)
            uniq, inv = jnp.unique(flat, return_inverse=True,
                                   size=flat.shape[0], fill_value=0)
            return pool[uniq][inv.reshape(nb.shape)]

        Xn = pool_gather(data["pool_tokens"])
        yn = pool_gather(data["pool_labels"])
        X = jnp.concatenate([Xt[:, None, :], Xn], axis=1)
        y = jnp.concatenate([yt[:, None], yn], axis=1)
        if Xf is not None:
            Xf = jnp.concatenate(
                [Xf[:, None, :], pool_gather(data["pool_numeric"])], axis=1)
    else:
        X = Xt[:, None, :]
        y = yt[:, None]
        if Xf is not None:
            Xf = Xf[:, None, :]
    return X, y, Xf, nmask


#: probe winners keyed by (variant, model dims, B, t): a process that
#: fits several experiments at one shape pays the two probe compiles
#: once, not per fit()
_ENCODER_IMPL_CACHE = {}


def _probe_encoder_impl(model, batch, t, trials=3):
    """Time one jitted fwd+bwd of each m2/m3 encoder implementation at
    the experiment's ACTUAL (batch, 1+K) grid shape; return the faster
    of 'stream'/'grid_minor'. Salted inputs defeat remote-runtime result
    caches; min-of-N damps shared-chip interference; everything (init
    included) is jitted — eager op-by-op dispatch through a busy tunnel
    can take minutes."""
    from ..nn.encoders import (CascadeEncoder, CrossIntraEncoder,
                               CrossIntraEncoderPA, JointEncoder)
    d = model.embedding_dim
    s = model.num_fields + 1
    hidden = d * model.scale_dim
    x0 = jnp.asarray(np.random.RandomState(0)
                     .randn(batch, t, s, d).astype(np.float32))
    best, winner = None, "stream"
    for impl in ("stream", "grid_minor"):
        if model.variant == "pa":
            enc = CrossIntraEncoderPA(d, model.num_heads, model.dim_head,
                                      0.0, model.depth, hidden, impl=impl)
        elif model.variant == "jm":
            enc = JointEncoder(d, model.depth, model.num_heads,
                               model.dim_head, hidden, 0.0, impl=impl)
        elif model.variant == "ce":
            enc = CascadeEncoder(d, model.depth, model.num_heads,
                                 model.dim_head, hidden, 0.0, impl=impl)
        else:
            enc = CrossIntraEncoder(d, model.num_heads, model.dim_head,
                                    0.0, model.depth, hidden, impl=impl)
        v = jax.jit(enc.init)(jax.random.PRNGKey(0), x0)
        step = jax.jit(jax.value_and_grad(
            lambda p, xx, e=enc: jnp.sum(e.apply(p, xx) ** 2)))
        val, _ = step(v, x0)
        jax.block_until_ready(val)
        times = []
        for i in range(trials):
            xi = x0 * (1.0 + 1e-6 * (i + 1))
            tic = time.perf_counter()
            val, _ = step(v, xi)
            float(jax.device_get(val))
            times.append(time.perf_counter() - tic)
        if best is None or min(times) < best:
            best, winner = min(times), impl
    return winner


class Trainer(object):
    def __init__(self, feature_map, params, mesh=None):
        """mesh: optional jax.sharding.Mesh with ('data', 'model') axes.
        When given, the train/eval steps compile as SPMD programs: batch
        sharded over 'data', embedding tables row-sharded over 'model'
        (see rat_tpu.parallel.mesh)."""
        self.mesh = mesh
        self.feature_map = feature_map
        self.params = params
        self.model = build_model(feature_map, params)
        self.model_id = params.get("model_id", params["model"])
        self.model_dir = os.path.join(params.get("model_root", "./exps/"),
                                      feature_map.dataset_id)
        self.checkpoint = os.path.abspath(
            os.path.join(self.model_dir, self.model_id + ".model"))
        self._monitor = Monitor(kv=params.get("monitor", "AUC"))
        self._monitor_mode = params.get("monitor_mode", "max")
        self._patience = params.get("patience", 2)
        self._every_x_epochs = params.get("every_x_epochs", 1)
        self._save_best_only = params.get("save_best_only", True)
        self._embedding_regularizer = params.get("embedding_regularizer", None)
        self._net_regularizer = params.get("net_regularizer", None)
        self._reduce_lr_on_plateau = params.get("reduce_lr_on_plateau", True)
        self._validation_metrics = params.get("metrics", ["AUC", "logloss"])
        self._verbose = params.get("verbose", 1)
        self._learning_rate = params.get("learning_rate", 1e-3)
        self._max_gradient_norm = params.get("max_gradient_norm", 10.)
        self._batch_norm = params.get("batch_norm", False)
        if params.get("neighbor_padding", "wrap") not in ("wrap", "mask"):
            # an unknown value silently training with the wrap bug the
            # mask mode exists to correct would be the worst failure
            raise ValueError(
                "neighbor_padding={!r} is not supported (use 'wrap' for "
                "reference bug-parity or 'mask' for corrected "
                "semantics)".format(params["neighbor_padding"]))
        self._seed = params.get("seed", 2021)
        self._rng = jax.random.PRNGKey(self._seed)
        # dedicated host RNG for batch/block shuffling: batch order must
        # not depend on third-party code touching the GLOBAL np.random
        # between epochs (reference relies on seed_everything alone)
        self._shuffle_rng = np.random.RandomState(self._seed)
        # profiling hooks (new vs reference: SURVEY.md §5 tracing row)
        self._profile_dir = params.get("profile_dir", None)
        self._profile_steps = params.get("profile_steps", 10)
        self.tx = get_optimizer(params.get("optimizer", "adam"),
                                self._learning_rate, self._max_gradient_norm)
        self.state = None
        self._jit_train_step = None
        self._jit_train_scan = None
        self._jit_eval_step = None
        self._jit_eval_scan = None

    # ---- multi-process helpers -------------------------------------------
    def _multiprocess(self):
        return jax.process_count() > 1

    #: max bytes per single host->device transfer; GB-scale single
    #: device_puts have wedged the remote tunnel mid-transfer (observed
    #: r5 on the full Tmall valid split: the tunnel proxy stopped
    #: draining with the client 95% rwnd-limited and never recovered).
    #: Row-chunked puts bound each transfer and give the runtime a sync
    #: point per chunk. RAT_TPU_UPLOAD_CHUNK_MB overrides; 0 disables.
    _UPLOAD_CHUNK_BYTES = 128 * 1024 * 1024

    def _upload_chunk_bytes(self):
        mb = os.environ.get("RAT_TPU_UPLOAD_CHUNK_MB")
        return int(mb) * 1024 * 1024 if mb else self._UPLOAD_CHUNK_BYTES

    def _to_device(self, arr, sharding=None):
        """Upload a host array; under multi-process runs every device
        array must be a GLOBAL array assembled from process-local data
        (each host holds the full value for replicated shardings)."""
        arr = np.asarray(arr)
        if self.mesh is not None and self._multiprocess():
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = sharding or NamedSharding(self.mesh, P())
            # every process holds the FULL value; global_shape=local
            # shape tells jax to slice out this process's shards rather
            # than concatenate over processes
            return jax.make_array_from_process_local_data(
                sharding, arr, global_shape=arr.shape)
        chunk = self._upload_chunk_bytes()
        if sharding is None and chunk and arr.ndim >= 1 \
                and arr.nbytes > chunk:
            row_bytes = max(arr.nbytes // max(arr.shape[0], 1), 1)
            rows = max(chunk // row_bytes, 1)
            buf = jnp.zeros(arr.shape, arr.dtype)
            n = 0
            for lo in range(0, arr.shape[0], rows):
                part = jnp.asarray(arr[lo:lo + rows])
                jax.block_until_ready(part)   # bound in-flight transfer
                buf = _chunk_write(buf, part, jnp.int32(lo))
                n += 1
            jax.block_until_ready(buf)
            logging.info("chunked upload: %.0f MB in %d parts",
                         arr.nbytes / 1e6, n)
            return buf
        return jnp.asarray(arr) if sharding is None \
            else jax.device_put(arr, sharding)

    def _globalize_idx(self, idx):
        """Batch ids for one step: single-process passes them through;
        multi-process hosts each contribute their contiguous slice of
        the (identically computed) global batch."""
        if self.mesh is None or not self._multiprocess():
            return jnp.asarray(idx)
        from ..parallel.distributed import (host_local_batch_to_global,
                                            process_local_rows)
        local = process_local_rows(len(idx), np.asarray(idx))
        return host_local_batch_to_global(local, self.mesh)

    def _globalize_idx_group(self, idx_group):
        """[G, B] group of index batches for one scanned dispatch (scan
        axis replicated, batch axis sharded over 'data'); multi-process
        hosts each contribute their contiguous [G, B_local] slice."""
        if self.mesh is None or not self._multiprocess():
            return jnp.asarray(idx_group)
        from ..parallel.distributed import host_local_index_group_to_global
        return host_local_index_group_to_global(np.asarray(idx_group),
                                                self.mesh)

    # ---- state ----------------------------------------------------------
    def init_state(self, example_X, example_y):
        self._grid_t = int(np.shape(example_X)[1])  # 1+K, for the probe
        init_rng, self._rng = jax.random.split(self._rng)
        example_X_num = None
        if any(spec["type"] == "numeric" for spec
               in self.feature_map.feature_specs.values()):
            example_X_num = np.zeros(np.shape(example_X), np.float32)

        def init_fn(rng, X, y, Xf):
            variables = self.model.init({"params": rng, "dropout": rng},
                                        X, y, Xf, train=False)
            params = variables["params"]
            return TrainState(params=params,
                              batch_stats=variables.get("batch_stats", {}),
                              opt_state=self.tx.init(params),
                              step=jnp.zeros((), jnp.int32))

        has_pretrained = bool(getattr(self.model, "embedding_spec", None)
                              and self.model.embedding_spec.pretrained)
        if self.mesh is not None and not has_pretrained:
            # SPMD init: shapes are computed once, and every leaf is born
            # with its mesh sharding — the only multi-host-correct path
            # (host-local init + device_put cannot place non-addressable
            # shards), and it skips the replicated->sharded copy.
            from ..parallel import state_sharding
            shapes = jax.eval_shape(init_fn, init_rng,
                                    jax.ShapeDtypeStruct(np.shape(example_X),
                                                         jnp.int32),
                                    jax.ShapeDtypeStruct(np.shape(example_y),
                                                         jnp.float32),
                                    example_X_num)
            self._state_shard = state_sharding(shapes, self.mesh)
            # numpy inputs: implicitly replicated across processes
            # (committed single-device arrays are illegal multi-host)
            self.state = jax.jit(init_fn,
                                 out_shardings=self._state_shard)(
                np.asarray(jax.device_get(init_rng)),
                np.asarray(example_X, np.int32),
                np.asarray(example_y, np.float32),
                example_X_num)
            return self.state
        self.state = init_fn(init_rng, jnp.asarray(example_X),
                             jnp.asarray(example_y), example_X_num)
        if self.mesh is not None:
            from ..parallel import state_sharding
            self._state_shard = state_sharding(self.state, self.mesh)
            self.state = jax.device_put(self.state, self._state_shard)
        return self.state

    def count_parameters(self, count_embedding=True):
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                self.state.params)[0]:
            name = ".".join(getattr(k, "key", str(k)) for k in path)
            if not count_embedding and "embedding" in name:
                continue
            total += int(np.prod(leaf.shape))
        logging.info("Total number of parameters: {}.".format(total))
        return total

    # ---- jitted steps ---------------------------------------------------
    def _encoder_probe_shape(self):
        """The (batch, 1+K) grid shape the train step will actually run
        at — fit() records the generator's batch size and init_state the
        grid's sample count, so the autotune probe measures the very
        shape it must predict (a B=512 or K=10 experiment must not get a
        winner timed at 4096x6)."""
        return (int(getattr(self, "_probe_batch", None)
                    or self.params.get("batch_size", 4096)),
                int(getattr(self, "_grid_t", 6)))

    def _use_fast_forward(self):
        """Fused Pallas path: default variant, no dropout/BN, relu DNN,
        parity (wrap) neighbor padding."""
        m = self.model
        return (self.params.get("use_pallas", False)
                and m.variant == "default"
                and m.dropout == 0 and m.emb_dropout == 0
                and m.net_dropout == 0 and not m.batch_norm
                and str(m.dnn_activations).lower() == "relu"
                and self.params.get("neighbor_padding", "wrap") == "wrap")

    def _resolve_encoder_impl(self):
        """encoder_impl='auto' (the default): on a single-process
        accelerator backend with the default (m2) variant, time one
        fwd+bwd of each encoder implementation at the model's grid
        shapes and rebuild the model with the winner — the encoder is
        the only part of the step that differs, so its isolated ranking
        decides the step's (measured 2026-08: grid_minor 1.4x on a
        relayout-degraded chip; parameter trees are identical so the
        already-initialized state stays valid). Pinned configs
        (encoder_impl=stream|grid_minor), RAT_TPU_ENCODER_IMPL, CPU
        backends, and multi-process runs (timing is nondeterministic
        across hosts and every process must trace the same program)
        all skip the probe."""
        if getattr(self, "_encoder_impl_resolved", False):
            return
        self._encoder_impl_resolved = True
        if self.params.get("encoder_impl", "auto") != "auto":
            return
        if os.environ.get("RAT_TPU_ENCODER_IMPL"):
            return
        m = self.model
        if getattr(m, "variant", None) not in ("default", "pa", "jm", "ce") \
                or self._use_fast_forward():
            return
        if m.variant == "pa" and m.num_heads < 2:
            return
        try:
            platform = jax.devices()[0].platform
        except Exception:
            return
        if platform == "cpu" or self._multiprocess():
            return
        B, t = self._encoder_probe_shape()
        key = (m.variant, m.embedding_dim, m.num_heads, m.dim_head,
               m.depth, m.scale_dim, m.num_fields, B, t)
        winner = _ENCODER_IMPL_CACHE.get(key)
        if winner is None:
            tic = time.perf_counter()
            winner = _probe_encoder_impl(m, batch=B, t=t)
            _ENCODER_IMPL_CACHE[key] = winner
            logging.info(
                "encoder_impl=auto probe winner: %s (B=%d, t=%d, "
                "probe cost %.1fs)", winner, B, t,
                time.perf_counter() - tic)
        self._probe_resolved_shape = (B, t)
        if winner != "stream":
            self.model = build_model(self.feature_map,
                                     dict(self.params, encoder_impl=winner))

    def _build_steps(self):
        self._resolve_encoder_impl()
        model = self.model
        tx = self.tx
        emb_reg = self._embedding_regularizer
        net_reg = self._net_regularizer
        has_bn = self._batch_norm
        loss_fn_elem = get_loss_fn(self.params.get("loss", "binary_crossentropy"))
        dedup = bool(self.params.get("dedup_neighbors", False)) or \
            os.environ.get("RAT_TPU_DEDUP_NEIGHBORS") == "1"
        use_fast = self._use_fast_forward()
        if use_fast:
            from ..models.fast_forward import rat_m2_fast_forward
            logging.info("Using fused Pallas fast-forward path for RAT_m2")

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            dp = NamedSharding(self.mesh, P("data"))
            state_shard = self._state_shard
            train_jit = partial(
                jax.jit, donate_argnums=(0,),
                # split arrays replicated, batch ids sharded over 'data'
                in_shardings=(state_shard, rep, dp, rep, rep),
                out_shardings=(state_shard, rep))
            train_scan_jit = partial(
                jax.jit, donate_argnums=(0,),
                # idx group [G, B]: scan (group) axis replicated, batch
                # axis sharded over 'data'; per-step valid counts tiny
                in_shardings=(state_shard, rep,
                              NamedSharding(self.mesh, P(None, "data")),
                              rep, rep),
                out_shardings=(state_shard, rep))
            # multi-process: predictions must come back replicated so
            # every host can device_get them (a data-sharded global
            # array is not fully addressable from one process)
            eval_out = rep if self._multiprocess() else dp
            eval_jit = partial(jax.jit,
                               in_shardings=(state_shard, rep, dp),
                               out_shardings=(eval_out, eval_out))
            scan_dp = NamedSharding(self.mesh, P(None, "data"))
            scan_out = rep if self._multiprocess() else scan_dp
            eval_scan_jit = partial(jax.jit,
                                    in_shardings=(state_shard, rep, scan_dp),
                                    out_shardings=(scan_out, scan_out))
        else:
            train_jit = partial(jax.jit, donate_argnums=(0,))
            train_scan_jit = partial(jax.jit, donate_argnums=(0,))
            eval_jit = jax.jit
            eval_scan_jit = jax.jit

        def _train_core(state, data, idx, valid, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                X, y, Xf, nmask = _gather_batch(data, idx,
                                                dedup_neighbors=dedup)
                if use_fast:
                    out = rat_m2_fast_forward(params, model, X, y, Xf)
                    new_stats = state.batch_stats
                elif has_bn:
                    out, mutated = model.apply(variables, X, y, Xf, train=True,
                                               nbr_mask=nmask,
                                               rngs={"dropout": step_rng},
                                               mutable=["batch_stats"])
                    new_stats = mutated["batch_stats"]
                else:
                    out = model.apply(variables, X, y, Xf, train=True,
                                      nbr_mask=nmask,
                                      rngs={"dropout": step_rng})
                    new_stats = state.batch_stats
                pred = out["y_pred"][:, 0]
                target = out["y_true"][:, 0]
                mask = (jnp.arange(pred.shape[0]) < valid).astype(pred.dtype)
                loss = jnp.sum(loss_fn_elem(pred, target) * mask) / valid
                loss = loss + regularization_loss(params, emb_reg, net_reg)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            return state.replace(params=params, batch_stats=new_stats,
                                 opt_state=opt_state,
                                 step=state.step + 1), loss

        train_step = train_jit(_train_core)

        @train_scan_jit
        def train_scan(state, data, idx_group, valid_group, rng):
            """A fixed-size GROUP of train steps in one dispatch:
            idx_group [G, B], valid_group [G] -> (state after G steps,
            [G] per-step losses). lax.scan carries TrainState so each
            iteration is the exact per-step computation (dropout rngs
            fold in state.step, BN stats and Adam moments chain) — the
            host round-trip that otherwise dominates training on a
            high-latency link happens once per group instead of once
            per batch (mirrors the eval-side eval_scan below)."""
            def body(st, xs):
                idx, valid = xs
                return _train_core(st, data, idx, valid, rng)
            return jax.lax.scan(body, state, (idx_group, valid_group))

        def _eval_core(state, data, idx):
            variables = {"params": state.params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            X, y, Xf, nmask = _gather_batch(data, idx, dedup_neighbors=dedup)
            if use_fast:
                out = rat_m2_fast_forward(state.params, model, X, y, Xf)
            else:
                out = model.apply(variables, X, y, Xf, train=False,
                                  nbr_mask=nmask)
            return out["y_pred"][:, 0], out["y_true"][:, 0]

        eval_step = eval_jit(_eval_core)

        @eval_scan_jit
        def eval_scan(state, data, idx_batches):
            """Many eval batches per dispatch: idx_batches [nb, B] ->
            ([nb, B] preds, [nb, B] labels). One host round-trip per
            GROUP instead of per batch — per-dispatch latency dominates
            large-set evaluation otherwise (21M Tmall rows = 5200
            batches)."""
            def body(carry, idx):
                return carry, _eval_core(state, data, idx)
            _, out = jax.lax.scan(body, None, idx_batches)
            return out

        self._jit_train_step = train_step
        self._jit_train_scan = train_scan
        self._jit_eval_step = eval_step
        self._jit_eval_scan = eval_scan

    # ---- device split upload -------------------------------------------
    def device_split(self, gen):
        darray = gen.darray
        has_numeric = any(spec["type"] == "numeric" for spec
                          in self.feature_map.feature_specs.values())
        up = self._to_device
        data = {
            "tokens": up(darray[:, :-1].astype(np.int32)),
            "labels": up(darray[:, -1].astype(np.float32)),
        }
        if has_numeric:
            data["numeric"] = up(darray[:, :-1].astype(np.float32))
        if gen.retrieval_augmented:
            if gen.retr_lens.ndim != 1:
                raise AssertionError(
                    "RIM does not support label-wise retrieval-enhanced training")
            pool = gen.pool_darray
            # splits that read the same explicit pool file (Tmall-style:
            # train and valid against one 20M-row pool) share ONE device
            # upload — the duplicate cost 2x pool HBM (~720 MB at Tmall
            # scale) and tipped a shared-tenant chip into OOM. "self"
            # pools key by array identity, never by equal content.
            pool_key = getattr(gen, "retrieval_pool_fname", None)
            if pool_key in (None, "self"):
                pool_key = id(pool)
            cached = getattr(self, "_pool_device_cache", None)
            if cached is not None and cached[0] == pool_key:
                data.update(cached[1])
            else:
                pool_up = {"pool_tokens": up(pool[:, :-1].astype(np.int32)),
                           "pool_labels": up(pool[:, -1].astype(np.float32))}
                if has_numeric:
                    pool_up["pool_numeric"] = up(pool[:, :-1]
                                                 .astype(np.float32))
                self._pool_device_cache = (pool_key, pool_up)
                data.update(pool_up)
            data["nbr"] = up(gen.neighbor_gather_indices())
            if self.params.get("neighbor_padding", "wrap") == "mask":
                data["nbr_ok"] = up(gen.neighbor_valid_mask())
        return data

    # ---- fit loop -------------------------------------------------------
    def fit(self, train_gen, validation_data=None, epochs=1, **kwargs):
        from ..data.block_loader import DataBlockGenerator
        self._block_mode = isinstance(train_gen, DataBlockGenerator)
        if self.state is None:
            k = train_gen.topk
            L = self.feature_map.input_length or self.feature_map.num_fields
            self.init_state(np.zeros((2, 1 + k, L), np.int32),
                            np.zeros((2, 1 + k), np.float32))
        self._probe_batch = getattr(train_gen, "batch_size", None)
        if (self._jit_train_step is not None
                and getattr(self, "_probe_resolved_shape", None) is not None
                and self._probe_resolved_shape != self._encoder_probe_shape()):
            # the autotune winner was probed at a different grid shape
            # (e.g. evaluate()/predict() built the steps before fit()
            # knew the generator's batch size): re-resolve at the real
            # shape and rebuild — winners are cached per shape, so a
            # matching earlier probe costs nothing
            self._encoder_impl_resolved = False
            self._probe_resolved_shape = None  # re-set only if a probe runs
            self.model = build_model(self.feature_map, self.params)
            self._jit_train_step = None
        if self._jit_train_step is None:
            self._build_steps()
        self.valid_gen = validation_data
        # lazy_valid_upload: don't keep the validation split device-
        # resident through training — _eval_stream uploads it per eval
        # call and frees it after, trading one re-upload per eval for
        # ~split-size HBM headroom during train steps (needed when a
        # shared-tenant chip can't hold train + valid + activations)
        lazy_valid = bool(self.params.get("lazy_valid_upload", False)) \
            or os.environ.get("RAT_TPU_LAZY_VALID") == "1"
        self._valid_data = None if (lazy_valid or isinstance(
            validation_data, DataBlockGenerator)) \
            else self.device_split(validation_data)
        self._train_data = None if self._block_mode else self.device_split(train_gen)
        self._best_metric = np.inf if self._monitor_mode == "min" else -np.inf
        self._stopping_steps = 0
        self._total_batches = 0
        self._batches_per_epoch = len(train_gen)
        self._every_x_batches = int(np.ceil(self._every_x_epochs *
                                            self._batches_per_epoch))
        self._stop_training = False

        logging.info("Start training: {} batches/epoch".format(
            self._batches_per_epoch))
        logging.info("************ Epoch=1 start ************")
        for epoch in range(epochs):
            epoch_loss, examples, secs = self.train_one_epoch(train_gen, epoch)
            logging.info("Train loss: {:.6f}".format(epoch_loss))
            logging.info("Train throughput: {:.0f} examples/s".format(
                examples / max(secs, 1e-9)))
            if self._stop_training:
                break
            else:
                logging.info("************ Epoch={} end ************".format(epoch + 1))
        logging.info("Training finished.")

    def _epoch_stream(self, train_gen):
        """(device_data, idx, valid) triples for one epoch; block mode
        uploads one block at a time (data_generator.py:452-455 shape)."""
        if getattr(self, "_block_mode", False):
            for view in train_gen.iter_block_views(rng=self._shuffle_rng):
                block_data = self.device_split(view)
                for idx, valid in view.epoch_index_batches(
                        rng=self._shuffle_rng):
                    yield block_data, idx, valid
        else:
            if self._train_data is None:
                self._train_data = self.device_split(train_gen)
            for idx, valid in train_gen.epoch_index_batches(
                    rng=self._shuffle_rng):
                yield self._train_data, idx, valid

    #: train batches folded into one scanned dispatch (the train-side
    #: mirror of _EVAL_SCAN_BATCHES); config key ``train_scan_batches``
    #: / env RAT_TPU_TRAIN_SCAN_BATCHES override, <=1 disables grouping
    _TRAIN_SCAN_BATCHES = 64

    def _train_group_size(self):
        """Batches per scanned train dispatch. 0 = per-step only (a
        profiling epoch needs per-step dispatch boundaries for the trace
        window). Multi-process runs group too: each host contributes its
        [G, B_local] slice of the global index group, so pods get the
        same dispatch amortization as single-process."""
        env = os.environ.get("RAT_TPU_TRAIN_SCAN_BATCHES")
        g = int(env) if env is not None else \
            int(self.params.get("train_scan_batches",
                                self._TRAIN_SCAN_BATCHES))
        return g if g > 1 else 0

    def train_one_epoch(self, train_gen, epoch):
        profiling = self._profile_dir is not None and epoch == 0
        group = 0 if profiling else self._train_group_size()
        if group:
            return self._train_one_epoch_grouped(train_gen, group)
        return self._train_one_epoch_stepwise(train_gen, epoch)

    def _epoch_rng(self):
        rng, self._rng = jax.random.split(self._rng)
        if self.mesh is not None and self._multiprocess():
            # numpy -> implicitly replicated; a committed single-device
            # key array is illegal as a multi-host jit input
            rng = np.asarray(jax.device_get(rng))
        return rng

    def _epoch_loss(self, losses):
        """losses: device scalars (per-step path) and/or [G] vectors
        (scanned groups); epoch loss divides by the FULL batch count
        even when early stop cuts the epoch short (the reference's
        denominator, base_model.py:226-228)."""
        return float(sum(np.sum(x) for x in jax.device_get(losses))) \
            / self._batches_per_epoch

    def _train_one_epoch_stepwise(self, train_gen, epoch):
        losses = []
        examples = 0
        tic = time.time()
        rng = self._epoch_rng()
        profiling = self._profile_dir is not None and epoch == 0
        for batch_index, (data, idx, valid) in enumerate(self._epoch_stream(train_gen)):
            if profiling and batch_index == 2:  # skip compile steps
                jax.profiler.start_trace(self._profile_dir)
            self.state, loss = self._jit_train_step(
                self.state, data, self._globalize_idx(idx),
                np.float32(valid), rng)
            losses.append(loss)
            examples += valid
            if profiling and batch_index == 2 + self._profile_steps:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                logging.info("Profiler trace written to {}".format(
                    self._profile_dir))
                profiling = False
            self.on_batch_end(batch_index)
            if self._stop_training:
                break
        if profiling and len(losses) > 2:
            jax.block_until_ready(losses[-1])
            jax.profiler.stop_trace()
        epoch_secs = time.time() - tic
        return self._epoch_loss(losses), examples, epoch_secs

    def _train_one_epoch_grouped(self, train_gen, group):
        """Per-step semantics at grouped dispatch cost. Batches are
        buffered and flushed as ONE scanned dispatch per full group;
        groups never span an eval boundary (so evaluate() always sees
        the state exactly after the boundary batch, like per-step) or a
        device-data change (block mode uploads one block at a time).
        Remainder batches before a boundary go through the per-step
        program — identical numerics, just latency-bound — so the only
        compiled train programs are the step and the fixed-[G] scan."""
        losses = []
        examples = 0
        tic = time.time()
        rng = self._epoch_rng()
        n_epoch = self._batches_per_epoch
        every_x = self._every_x_batches
        pend = []           # buffered (idx, valid)
        cur_data = None     # device split the buffer gathers from
        dispatched = 0      # batches already dispatched this epoch
        last_beat = tic     # heartbeat so watchdogs (and humans) can
                            # tell a long silent epoch from a wedged one

        def finalize():
            """Dispatch the buffer, then run per-batch bookkeeping."""
            nonlocal dispatched, pend, examples
            if not pend:
                return
            if len(pend) == group:
                idxs = np.stack([np.asarray(i) for i, _ in pend])
                valids = np.asarray([v for _, v in pend], np.float32)
                self.state, loss_vec = self._jit_train_scan(
                    self.state, cur_data,
                    self._globalize_idx_group(idxs.astype(np.int32)),
                    valids, rng)
                losses.append(loss_vec)
            else:
                for bidx, bvalid in pend:
                    self.state, loss = self._jit_train_step(
                        self.state, cur_data, self._globalize_idx(bidx),
                        np.float32(bvalid), rng)
                    losses.append(loss)
            for _, bvalid in pend:
                examples += bvalid
            n = len(pend)
            pend = []
            base, dispatched = dispatched, dispatched + n
            nonlocal last_beat
            now = time.time()
            if now - last_beat >= 60.0:
                last_beat = now
                logging.info(
                    "epoch progress: %d/%d batches dispatched "
                    "(%.0f examples/s dispatch-side)", dispatched,
                    n_epoch, examples / max(now - tic, 1e-9))
            for i in range(n):
                # boundary batches are group-final by construction, so
                # evaluate() runs against the post-boundary state
                self.on_batch_end(base + i)
                if self._stop_training:
                    break

        for data, idx, valid in self._epoch_stream(train_gen):
            if pend and data is not cur_data:
                finalize()
            if self._stop_training:
                break
            cur_data = data
            pend.append((idx, valid))
            b = dispatched + len(pend) - 1  # this batch's epoch index
            if len(pend) == group or (b + 1) % every_x == 0 \
                    or (b + 1) % n_epoch == 0:
                finalize()
                if self._stop_training:
                    break
        finalize()
        epoch_secs = time.time() - tic
        return self._epoch_loss(losses), examples, epoch_secs

    def on_batch_end(self, batch):
        self._total_batches += 1
        if (batch + 1) % self._every_x_batches == 0 or \
                (batch + 1) % self._batches_per_epoch == 0:
            epoch = round(float(self._total_batches) / self._batches_per_epoch, 2)
            val_logs = self.evaluate(self.valid_gen, data=self._valid_data)
            self.checkpoint_and_earlystop(epoch, val_logs)
            logging.info("--- {}/{} batches finished ---".format(
                batch + 1, self._batches_per_epoch))

    def lr_decay(self, factor=0.1, min_lr=1e-6):
        reduced_lr = max(get_learning_rate(self.state.opt_state) * factor, min_lr)
        self.state = self.state.replace(
            opt_state=set_learning_rate(self.state.opt_state, reduced_lr))
        return reduced_lr

    def checkpoint_and_earlystop(self, epoch, logs, min_delta=1e-6):
        monitor_value = self._monitor.get_value(logs)
        if (self._monitor_mode == "min" and
                monitor_value > self._best_metric - min_delta) or \
           (self._monitor_mode == "max" and
                monitor_value < self._best_metric + min_delta):
            self._stopping_steps += 1
            logging.info("Monitor({}) STOP: {:.6f} !".format(
                self._monitor_mode, monitor_value))
            if self._reduce_lr_on_plateau:
                current_lr = self.lr_decay()
                logging.info("Reduce learning rate on plateau: {:.6f}"
                             .format(current_lr))
        else:
            self._stopping_steps = 0
            self._best_metric = monitor_value
            if self._save_best_only:
                logging.info("Save best model: monitor({}): {:.6f}"
                             .format(self._monitor_mode, monitor_value))
                self.save_weights(self.checkpoint)
        if self._stopping_steps * self._every_x_epochs >= self._patience:
            self._stop_training = True
            logging.info("Early stopping at epoch={:g}".format(epoch))
        if not self._save_best_only:
            self.save_weights(self.checkpoint)

    # ---- evaluation -----------------------------------------------------
    def _eval_stream(self, data_gen, data=None):
        from ..data.block_loader import DataBlockGenerator
        if isinstance(data_gen, DataBlockGenerator):
            for view in data_gen.iter_block_views():
                block_data = self.device_split(view)
                for idx, valid in view.epoch_index_batches():
                    yield block_data, idx, valid
        else:
            if data is None:
                data = self.device_split(data_gen)
            for idx, valid in data_gen.epoch_index_batches():
                yield data, idx, valid

    #: eval batches folded into one scanned dispatch
    _EVAL_SCAN_BATCHES = 64

    def _eval_dispatch(self, data_gen, data=None):
        """Dispatch the whole eval set asynchronously; yield
        (pred_device_array [nb, B], true_device_array [nb, B],
        valid row-counts per batch). _EVAL_SCAN_BATCHES index batches
        fold into one scanned dispatch — per-dispatch latency otherwise
        dominates large-set evaluation. Multi-process runs group too
        (hosts contribute [nb, B_local] slices of the global group)."""
        group = self._EVAL_SCAN_BATCHES
        small_set = getattr(data_gen, "num_batches", 0) < 2 * group
        if small_set:
            # not worth a second compiled program: still fully
            # asynchronous, the caller fetches everything in one
            # device_get
            for split_data, idx, valid in self._eval_stream(data_gen, data):
                p, t = self._jit_eval_step(self.state, split_data,
                                           self._globalize_idx(idx))
                yield p[None], t[None], [valid]
            return

        cur, ids, valids = None, [], []

        def flush():
            nb = len(ids)
            # pad the group to a fixed batch count so every dispatch
            # reuses one compiled program; padded slots get valid=0
            # and fall off the host-side slices
            padded = ids + [ids[-1]] * (group - nb)
            P, T = self._jit_eval_scan(
                self.state, cur,
                self._globalize_idx_group(np.stack(padded)))
            return P, T, valids + [0] * (group - nb)

        for split_data, idx, valid in self._eval_stream(data_gen, data):
            if ids and (split_data is not cur or len(ids) == group):
                yield flush()
                ids, valids = [], []
            cur = split_data
            ids.append(np.asarray(idx))
            valids.append(valid)
        if ids:
            yield flush()

    #: pending dispatched groups before a fetch is forced; bounds HBM
    #: residency (each group pins its source block's device buffers)
    #: while leaving the device pipeline several groups deep
    _EVAL_MAX_INFLIGHT_GROUPS = 8

    def _eval_collect(self, data_gen, data=None):
        """Drain _eval_dispatch with a bounded window of in-flight
        groups: dispatch stays asynchronous (a fetched group's wait
        overlaps later groups' compute) but block-mode eval can never
        pin more than ~window blocks' device buffers at once — an
        unbounded dispatch of a multi-block stream uploads every block
        before anything completes and OOMs HBM."""
        pending = deque()
        preds, trues = [], []

        def drain_one():
            p, t, valids = pending.popleft()
            P, T = jax.device_get((p, t))
            for i, v in enumerate(valids):
                preds.append(P[i][:v])
                trues.append(T[i][:v])

        for group in self._eval_dispatch(data_gen, data):
            pending.append(group)
            if len(pending) > self._EVAL_MAX_INFLIGHT_GROUPS:
                drain_one()
        while pending:
            drain_one()
        return np.concatenate(preds), np.concatenate(trues)

    def evaluate(self, data_gen, data=None):
        if self._jit_eval_step is None:
            self._build_steps()
        y_pred, y_true = self._eval_collect(data_gen, data)
        return evaluate_metrics(y_true.astype(np.float64),
                                y_pred.astype(np.float64),
                                self._validation_metrics)

    def predict(self, data_gen, data=None):
        if self._jit_eval_step is None:
            self._build_steps()
        y_pred, _ = self._eval_collect(data_gen, data)
        return y_pred.astype(np.float64)

    # ---- full-state checkpoint/resume -----------------------------------
    def save_train_state(self, path):
        """Checkpoint the FULL TrainState (params + optimizer moments +
        step) plus monitor bookkeeping for exact resume (beyond the
        reference's weights-only checkpoints, base_model.py:275-284)."""
        from .checkpoint import save_train_state
        extra = {
            "best_metric": float(getattr(self, "_best_metric", -np.inf)),
            "stopping_steps": int(getattr(self, "_stopping_steps", 0)),
            "total_batches": int(getattr(self, "_total_batches", 0)),
            "rng": np.asarray(jax.device_get(self._rng)).tolist(),
        }
        save_train_state(path, self.state, extra)

    def restore_train_state(self, path):
        from .checkpoint import restore_train_state
        self.state, extra = restore_train_state(path, self.state)
        if extra:
            self._best_metric = extra["best_metric"]
            self._stopping_steps = extra["stopping_steps"]
            self._total_batches = extra["total_batches"]
            self._rng = jnp.asarray(np.asarray(extra["rng"], dtype=np.uint32))
        return extra

    # ---- checkpoint IO --------------------------------------------------
    def _host_weights(self):
        """Params + batch stats as host arrays. Model-sharded leaves are
        not fully addressable from one process under multi-host, so they
        are first all-gathered to a replicated layout (every process
        participates; only rank 0 needs the bytes)."""
        params, stats = self.state.params, self.state.batch_stats
        if self.mesh is not None and self._multiprocess():
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            params, stats = jax.jit(lambda p, b: (p, b),
                                    out_shardings=rep)(params, stats)
        return jax.device_get(params), jax.device_get(stats)

    def save_weights(self, checkpoint):
        os.makedirs(os.path.dirname(checkpoint), exist_ok=True)
        params, stats = self._host_weights()
        if jax.process_index() == 0:
            with open(checkpoint, "wb") as f:
                f.write(serialization.to_bytes({"params": params,
                                                "batch_stats": stats}))

    def load_weights(self, checkpoint):
        params, stats = self._host_weights()  # templates (and a barrier)
        template = {"params": params, "batch_stats": stats}
        if self._multiprocess():
            # save_weights writes bytes only on rank 0, and model_root
            # need not be a shared filesystem on a pod — rank 0 reads,
            # everyone else receives the payload over the network
            from jax.experimental import multihost_utils
            if jax.process_index() == 0:
                with open(checkpoint, "rb") as f:
                    payload = serialization.from_bytes(template, f.read())
            else:
                payload = template
            payload = multihost_utils.broadcast_one_to_all(payload)
        else:
            with open(checkpoint, "rb") as f:
                payload = serialization.from_bytes(template, f.read())
        if self.mesh is not None:
            # restore the SPMD layout (row-sharded tables etc.) so the
            # compiled steps don't reshard on every call
            shard = self._state_shard
            put = self._to_device if self._multiprocess() else jax.device_put
            self.state = self.state.replace(
                params=jax.tree_util.tree_map(put, payload["params"],
                                              shard.params),
                batch_stats=jax.tree_util.tree_map(put, payload["batch_stats"],
                                                   shard.batch_stats))
        else:
            self.state = self.state.replace(
                params=jax.device_put(payload["params"]),
                batch_stats=jax.device_put(payload["batch_stats"]))
