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
import time


def main():
    from rat_tpu.cli import benchmark as bm
    from rat_tpu.cli.chip_health import collect as chip_health

    t0 = time.time()
    use_pallas = os.environ.get("RAT_TPU_BENCH_PALLAS", "0") == "1"
    health = chip_health()
    headline = bm.bench_train(use_pallas=use_pallas)
    headline["chip_health"] = health
    print(json.dumps(headline), flush=True)
    if os.environ.get("RAT_TPU_BENCH_HEADLINE_ONLY") == "1":
        return
    # secondary lines run as KILLABLE subprocesses with per-bench and
    # overall wall-clock budgets: on a degraded chip a single bench's
    # compile can hang many minutes, and an in-process budget cannot
    # interrupt a blocked device RPC — the capture must always reach
    # its closing line
    import subprocess
    import sys
    # budget counts from AFTER the headline printed: on a degraded
    # chip/tunnel the headline alone (probe compiles + bench) can take
    # ~6 min, and it must never consume the secondary lines' time
    t0 = time.time()
    budget = float(os.environ.get("RAT_TPU_BENCH_BUDGET_S", "420"))
    per_bench = float(os.environ.get("RAT_TPU_BENCH_EACH_S", "150"))
    secondary = [
        ("kkbox_train", ["--bench", "train", "--shape", "kkbox",
                         "--steps", "256"]),
        ("tmall_train", ["--bench", "train", "--shape", "tmall",
                         "--steps", "256"]),
        ("mltag_eval", ["--bench", "eval", "--shape", "mltag"]),
        ("retrieval", ["--bench", "retrieval"]),
        ("retrieval_exm", ["--bench", "retrieval_exm"]),
    ]
    n_ok = 0
    for name, argv in secondary:
        left = budget - (time.time() - t0)
        if left < 30:
            print(json.dumps({"metric": name, "skipped": "time budget"}),
                  flush=True)
            continue
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "rat_tpu.cli.benchmark"] + argv,
                capture_output=True, text=True,
                timeout=min(per_bench, left))
            lines = [l for l in proc.stdout.splitlines()
                     if l.startswith("{")]
            if lines:
                print(lines[-1], flush=True)
                n_ok += 1
            else:
                print(json.dumps({"metric": name, "error":
                                  (proc.stderr or "no output")[-200:]}),
                      flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": name,
                              "error": "timeout (degraded chip/tunnel)"}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)
    # repeat the headline last: robust to drivers that parse either end
    print(json.dumps(dict(headline, secondary_metrics_ok=n_ok)), flush=True)


if __name__ == "__main__":
    main()
