"""Benchmark: RAT_m2 (default RAT) training throughput, ML-Tag shaped.

Thin wrapper over rat_tpu.cli.benchmark.bench_train (single source of
truth for the workload definition; see that module for the shapes and
the reference baseline derivation).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Set RAT_TPU_BENCH_PALLAS=1 to run the fused-Pallas fast path.
"""

import json
import os


def main():
    from rat_tpu.cli.benchmark import bench_train
    use_pallas = os.environ.get("RAT_TPU_BENCH_PALLAS", "0") == "1"
    print(json.dumps(bench_train(use_pallas=use_pallas)))


if __name__ == "__main__":
    main()
