"""Benchmark capture: RAT_m2 training throughput + the full evidence
suite, each as ONE JSON line.

Line 1 (headline): ML-Tag-shaped train throughput
{"metric", "value", "unit", "vs_baseline", "chip_health"} — the
chip_health stamp (rat_tpu.cli.chip_health: link round-trip, marginal
MXU TFLOPS, per-kernel tax, small-dim MHSA µs) makes a capture taken in
a degraded tunnel/chip window self-labeling instead of masquerading as
a regression (BENCH_RESULTS.md "Variance note").

Subsequent lines (secondary evidence, VERDICT r4 item 1): KKBox- and
Tmall-shaped train, ML-Tag eval, BM25 retrieval (200k pool), and the
exact-match retrieval path. The final line repeats the headline fields
so the capture parses the same whether a driver reads the first or the
last JSON line. Set RAT_TPU_BENCH_HEADLINE_ONLY=1 to emit only the
headline; RAT_TPU_BENCH_PALLAS=1 runs the fused-Pallas fast path.

Workload definitions live in rat_tpu.cli.benchmark (single source of
truth; reference baselines derived from its committed single-GPU logs,
see BASELINE.md).
"""

import json
import os


def main():
    from rat_tpu.cli import benchmark as bm
    from rat_tpu.cli.chip_health import collect as chip_health

    use_pallas = os.environ.get("RAT_TPU_BENCH_PALLAS", "0") == "1"
    health = chip_health()
    headline = bm.bench_train(use_pallas=use_pallas)
    headline["chip_health"] = health
    print(json.dumps(headline), flush=True)
    if os.environ.get("RAT_TPU_BENCH_HEADLINE_ONLY") == "1":
        return
    secondary = [
        ("kkbox_train", lambda: bm.bench_train(use_pallas, shape="kkbox")),
        ("tmall_train", lambda: bm.bench_train(use_pallas, shape="tmall")),
        ("mltag_eval", lambda: bm.bench_eval(shape="mltag")),
        ("retrieval", bm.bench_retrieval),
        ("retrieval_exm", bm.bench_retrieval_exm),
    ]
    n_ok = 0
    for name, fn in secondary:
        try:
            print(json.dumps(fn()), flush=True)
            n_ok += 1
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)
    # repeat the headline last: robust to drivers that parse either end
    print(json.dumps(dict(headline, secondary_metrics_ok=n_ok)), flush=True)


if __name__ == "__main__":
    main()
