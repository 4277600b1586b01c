"""Profile the benchmark train step and print a per-op device-time table.

Captures an xplane trace of a few grouped train dispatches at the
bench shape (same program `bench.py` measures), then aggregates
device-side op durations by fusion name so the hot tail is visible.
Used to localize which ops a degraded chip mode is taxing.

Usage: python scripts/profile_train_step.py [shape] [group] [impl]
"""

import glob
import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "mltag"
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if len(sys.argv) > 3:
        os.environ["RAT_TPU_ENCODER_IMPL"] = sys.argv[3]

    import jax
    import jax.numpy as jnp

    from rat_tpu.cli.benchmark import _bench_setup

    trainer, data, idx, B = _bench_setup(shape)
    rng = jax.random.PRNGKey(0)
    idx_group = jnp.stack([idx[i % len(idx)] for i in range(group)])
    valid_group = jnp.full((group,), B, jnp.float32)
    # compile + warm
    for _ in range(2):
        trainer.state, losses = trainer._jit_train_scan(
            trainer.state, data, idx_group, valid_group, rng)
    float(jax.device_get(losses[-1]))

    tmp = tempfile.mkdtemp(prefix="rat_prof_")
    jax.profiler.start_trace(tmp)
    for _ in range(2):
        trainer.state, losses = trainer._jit_train_scan(
            trainer.state, data, idx_group, valid_group, rng)
    float(jax.device_get(losses[-1]))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane produced under", tmp)
        return
    from jax.profiler import ProfileData
    data = ProfileData.from_file(paths[0])
    per_op = {}
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        # one op-level line per plane: summing every line would count
        # the same device time once per hierarchy level (module line +
        # op line) and make the percentages meaningless
        op_lines = [l for l in plane.lines if "XLA Op" in l.name]
        if not op_lines and plane.lines:
            # no named op line: the deepest line is the op level
            op_lines = [list(plane.lines)[-1]]
        for line in op_lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e3  # us
                per_op[ev.name] = per_op.get(ev.name, 0.0) + dur
                total += dur

    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"planes parsed; total accounted {total/1e3:.2f} ms "
          f"(op-level lines only)")
    for name, us in ranked[:45]:
        print(f"{us:12.1f} us  {100*us/max(total,1e-9):5.2f}%  {name[:110]}")


if __name__ == "__main__":
    main()
