"""Quick A/B of train-step throughput knobs under a degraded chip.

Runs the same grouped-dispatch window as bench.py but short (128 steps),
printing examples/s, so candidate mitigations (XLA pass sets via
XLA_FLAGS, batch size, encoder impl) can be compared in minutes.

Usage: python scripts/degraded_ab.py [batch_size] [group] [steps]
Environment: XLA_FLAGS / RAT_TPU_ENCODER_IMPL as usual; RAT_AB_OVERRIDE
can hold a JSON dict of model-param overrides (e.g.
'{"dnn_hidden_units": [], "depth": 1}') to ablate step components.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax
    import jax.numpy as jnp

    from rat_tpu.cli.benchmark import _bench_setup

    trainer, data, idx, _ = _bench_setup("mltag", batch_size=B)
    rng = jax.random.PRNGKey(0)
    idx_group = jnp.stack([idx[i % len(idx)] for i in range(group)])
    valid_group = jnp.full((group,), B, jnp.float32)
    tic = time.perf_counter()
    trainer.state, losses = trainer._jit_train_scan(
        trainer.state, data, idx_group, valid_group, rng)
    float(jax.device_get(losses[-1]))
    compile_s = time.perf_counter() - tic
    for _ in range(max(1, 64 // group) - 1):
        trainer.state, losses = trainer._jit_train_scan(
            trainer.state, data, idx_group, valid_group, rng)
    float(jax.device_get(losses[-1]))

    rates = []
    for _ in range(3):
        tic = time.perf_counter()
        for _ in range(max(1, steps // group)):
            trainer.state, losses = trainer._jit_train_scan(
                trainer.state, data, idx_group, valid_group, rng)
        float(jax.device_get(losses[-1]))
        n = max(1, steps // group) * group * B
        rates.append(n / (time.perf_counter() - tic))
    print(f"B={B} group={group} impl={os.environ.get('RAT_TPU_ENCODER_IMPL','auto')} "
          f"xla_flags={os.environ.get('XLA_FLAGS','')!r} compile={compile_s:.1f}s "
          f"rates={[f'{r/1e3:.0f}k' for r in rates]} best={max(rates)/1e3:.0f}k ex/s "
          f"({1e3 * B / max(rates):.2f} ms/step)")


if __name__ == "__main__":
    main()
