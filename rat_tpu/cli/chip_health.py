"""Chip-health probe (importable core of scripts/chip_health.py).

Separates the three degradation modes observed on the shared-tunnel
environment (BENCH_RESULTS.md "Variance note") in ~60 s so any recorded
benchmark number is self-labeling:

- LINK: host<->device round-trip inflated (ms -> seconds);
- DEVICE-SHARING: fixed per-kernel tax on MB-scale buffers, large
  matmuls at a fraction of peak;
- SMALL-DIM RELAYOUT: layout-change copies around small-dim attention
  run ~30x slow while big-op rates stay at peak (the mode that tanks
  the train step specifically).

Every device rate is a MARGINAL cost — the time difference between a
long and a short version of the same program — so the (wildly variable)
link round-trip cancels out. Salted inputs defeat remote-runtime result
caches; every number is hard-synced via device_get of a fresh value.
"""

import time

_CALL_SEQ = [0]


def _sync_time(fn, x):
    import jax
    import jax.numpy as jnp
    _CALL_SEQ[0] += 1
    salt = jnp.float32(1.0 + 1e-7 * _CALL_SEQ[0])
    t0 = time.perf_counter()
    r = fn(x, salt)
    float(jax.device_get(jnp.ravel(r)[0]))
    return time.perf_counter() - t0


def collect():
    """Run all probes; returns the health dict (never raises — a probe
    failure is recorded as an 'error' field so a bench capture is still
    emitted)."""
    try:
        return _collect()
    except Exception as e:  # pragma: no cover - depends on live hardware
        return {"error": str(e)[:200], "healthy": False}


def _collect():
    import jax
    import jax.numpy as jnp

    out = {"platform": jax.default_backend()}
    if out["platform"] != "tpu":
        # the device probes (8192^2 matmul chains, MHSA scans) and every
        # threshold below are v5e-calibrated; on CPU/GPU they burn
        # minutes to produce meaningless numbers — stamp the platform
        # and skip
        out["healthy"] = None
        out["note"] = "device probes are TPU-only; skipped"
        return out

    # link probe: best-of-5 scalar round-trips (healthy: ~1-30 ms)
    rts = []
    for i in range(5):
        s = jnp.float32(1.0) + jnp.float32(i)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        float(jax.device_get(s))
        rts.append(time.perf_counter() - t0)
    out["roundtrip_ms"] = round(min(rts) * 1e3, 1)

    # device probe A: marginal per-kernel cost on MB-scale buffers.
    # Healthy ~0.02 ms/pass (bandwidth); sharing mode ~1.2 ms/pass.
    x0 = jnp.ones((2 * 1024 * 1024,), jnp.float32)

    def passes(n):
        def fn(x, salt):
            def body(c, _):
                (c,) = jax.lax.optimization_barrier((c * salt,))
                return c, None
            return jax.lax.scan(body, x, jnp.arange(n))[0]
        return jax.jit(fn)

    f20, f200 = passes(20), passes(200)
    _sync_time(f20, x0), _sync_time(f200, x0)          # compile
    t20 = min(_sync_time(f20, x0) for _ in range(2))
    t200 = min(_sync_time(f200, x0) for _ in range(2))
    out["kernel_tax_ms"] = round(max((t200 - t20) / 180 * 1e3, 0.0), 3)

    # device probe B: marginal MXU rate, (9-matmul - 1-matmul) / 8.
    # Healthy v5e at default precision: > 100 TFLOPS; sharing: tens.
    a = jnp.ones((8192, 8192), jnp.float32)

    def chain(n):
        def fn(x, salt):
            y = x * salt
            for _ in range(n):
                y = y @ x
            return y
        return jax.jit(fn)

    g1, g9 = chain(1), chain(9)
    _sync_time(g1, a), _sync_time(g9, a)               # compile
    t1 = min(_sync_time(g1, a) for _ in range(2))
    t9 = min(_sync_time(g9, a) for _ in range(2))
    dt = max((t9 - t1) / 8, 1e-9)
    out["matmul_tflops"] = round(2 * 8192 ** 3 / dt / 1e12, 1)

    # device probe C: the model's own attention at RAT grid shapes —
    # pins the small-dim layouts the relayout-degraded mode taxes ~30x
    # (synthetic swapaxes probes get layout-elided by the compiler).
    from ..nn.layers import _mhsa
    q0 = jnp.ones((24576, 4, 10), jnp.float32)

    def attn(n):
        def fn(x, salt):
            def body(c, _):
                (c2,) = jax.lax.optimization_barrier(
                    (_mhsa(c * salt, c, c, heads=2, scale=0.3),))
                return c2, None
            return jax.lax.scan(body, x, jnp.arange(n))[0]
        return jax.jit(fn)

    a10, a60 = attn(10), attn(60)
    _sync_time(a10, q0), _sync_time(a60, q0)           # compile
    tA = min(_sync_time(a10, q0) for _ in range(2))
    tB = min(_sync_time(a60, q0) for _ in range(2))
    out["mhsa_us"] = round(max((tB - tA) / 50 * 1e6, 0.0), 1)

    # mhsa healthy ~15 us at these shapes; the relayout-degraded state
    # measures ~60+ us here while the full model step runs 20-40x slow
    out["link_ok"] = out["roundtrip_ms"] < 300
    out["device_ok"] = (out["kernel_tax_ms"] < 0.15
                        and out["matmul_tflops"] > 80
                        and out["mhsa_us"] < 40)
    out["healthy"] = bool(out["link_ok"] and out["device_ok"])
    return out
