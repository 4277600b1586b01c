"""rat_tpu — a TPU-native retrieval-augmented CTR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
WWW'24 RAT reference implementation (RAT: Retrieval-Augmented
Transformer for CTR prediction, built on FuxiCTR v1.2.3).

Reference parity map (file:line citations point into /root/reference):

- feature pipeline   -> rat_tpu.features   (fuxictr/features.py, fuxictr/preprocess.py)
- dataset build      -> rat_tpu.data       (fuxictr/datasets/data_utils.py)
- BM25 retrieval     -> rat_tpu.retrieval  (fuxictr/datasets/data_utils.py:772-1064)
- NN layer library   -> rat_tpu.nn         (fuxictr/pytorch/layers/)
- models (4 heads)   -> rat_tpu.models     (fuxictr/pytorch/models/RAT_m{0..3}.py)
- training runtime   -> rat_tpu.engine     (fuxictr/pytorch/models/base_model.py)
- config/CLI/tuner   -> rat_tpu.utils, rat_tpu.cli, rat_tpu.autotuner
- mesh parallelism   -> rat_tpu.parallel   (new; the reference is single-GPU only)
- Pallas kernels     -> rat_tpu.ops        (new; fused cross/intra attention, BM25 scan)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# The reference trains in strict float32 (torch default; AMP disabled at
# fuxictr/datasets/data_utils.py:30). JAX's default matmul precision is
# lower (bf16-class passes) which costs ~1% relative error per matmul —
# enough to move AUC. Pin float32 for quality parity; set
# RAT_TPU_MATMUL_PRECISION=bfloat16 to trade accuracy for MXU speed.
_jax.config.update("jax_default_matmul_precision",
                   _os.environ.get("RAT_TPU_MATMUL_PRECISION", "float32"))
