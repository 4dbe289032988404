"""Benchmark: forward+backward Mrays/s per chip on the suzanne workload.

North-star metric (BASELINE.json): Mrays/s/chip fwd+bwd at 4 spp on
suzanne.gltf, depth 4. "Rays" counts wavefront lane-bounces actually
processed (pixels x spp x depth) — every lane is evaluated every bounce on
a SIMD machine, dead or alive, so this is the work the chip really does.

``vs_baseline``: the reference publishes no numbers (README is usage-only;
BASELINE.json "published": {}), and no Rust toolchain exists in this image
to measure it, so the denominator is MEASURED with tools/ref_baseline.cpp:
an original C++ reimplementation of the reference's per-ray suzanne
workload (flat median-split BVH + Möller–Trumbore + depth-4 cosine/light
mixture estimator, the reference's own glTF camera, same lane-ray
accounting as this file). On this machine it measures 23.35 Mrays/s on
one core and 81.73 Mrays/s on all 4 cores (2026-08-17; rebuild with
`python tools/measure_baseline.py`). The lean flat-array design should be
at least as fast per ray as the reference's Arc<dyn Hittable> pointer
tree, so 81.7 is a CONSERVATIVE (upper-bound) denominator. Full
derivation: BASELINE.md "vs_baseline derivation".

Prints ONE JSON line: {"metric","value","unit","vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: first-compile latency on the tunneled TPU
# backend is minutes and run-to-run variable; the cache makes repeat
# bench runs measure the kernel, not the compiler
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))


def _device_watchdog(timeout_s: float = 900.0):
    """Fail loudly instead of hanging forever when the tunneled TPU
    backend is unreachable (observed multi-hour outages): device init
    runs in a daemon thread; on timeout print an error JSON and exit."""
    import threading

    done = threading.Event()

    def probe():
        try:
            jax.devices()
            done.set()
        except Exception:
            pass  # main thread will time out and report

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "suzanne_fwd_bwd_mrays_per_s_per_chip",
            "value": None, "unit": "Mrays/s", "vs_baseline": None,
            "error": f"device init timed out after {timeout_s:.0f}s "
                     "(TPU tunnel unreachable)"}), flush=True)
        os._exit(3)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# measured by tools/measure_baseline.py on this 4-core host (see module
# docstring + BASELINE.md); forward-only workload vs our fwd+bwd metric,
# which biases the ratio AGAINST us — kept anyway, gradients are the point
REF_CPU_MRAYS_MEASURED = 81.73

WIDTH, HEIGHT, SPP, DEPTH = 512, 288, 4, 4


def flagship_scene():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__
    return __graft_entry__._flagship_scene()


def main():
    from rust_ray_tracer_tpu.models.scene import combine, partition
    from rust_ray_tracer_tpu.ops.integrator import render_waves

    _device_watchdog()
    scene = flagship_scene()
    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)
    chunk = 9216

    def loss_fn(diff, key, sweep):
        # ONE dispatch per SPP sweep: render_waves scans all 4 waves
        # in-graph (lax.scan). A single dispatch through this box's
        # TUNNELED backend carries a fixed ~25 ms host<->device RTT
        # (r5_rtt.py, 2026-08-20: 4/8/16/32-wave sweeps measure
        # 11.0/7.9/6.5/5.7 ms/wave fwd — a clean fixed-overhead fit,
        # asymptote = device time). A training loop never pays that
        # serially: it keeps several steps in flight (JAX async
        # dispatch), and the measured ASYNC-PIPELINED rate matches the
        # long-sweep asymptote (107 vs 104 Mrays/s fwd). The metric is
        # therefore the sustained pipelined step rate (8 independent
        # 4-wave steps in flight); the cold single-dispatch number is
        # reported alongside.
        img = render_waves(combine(diff, static), WIDTH, HEIGHT, key,
                           sweep * SPP, SPP, depth=DEPTH,
                           chunk_size=chunk)
        return jnp.mean(img)

    step = jax.jit(jax.value_and_grad(loss_fn))
    fwd = jax.jit(loss_fn)

    # warmup / compile
    loss, grads = step(diff, key, 0)
    jax.block_until_ready((loss, grads))
    jax.block_until_ready(fwd(diff, key, 0))

    def timed_single(fn, iters=5):
        """Median one-dispatch sweep (includes the ~25 ms tunnel RTT)."""
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(diff, key, i))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def timed_pipelined(fn, depth_q=8, reps=2):
        """Sustained rate with ``depth_q`` dispatches in flight — the
        shape of a real training loop; RTT overlaps device work."""
        best = None
        for r in range(reps):
            t0 = time.perf_counter()
            outs = [fn(diff, key, r * depth_q + i)
                    for i in range(depth_q)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / depth_q
            best = dt if best is None else min(best, dt)
        return best

    dt = timed_pipelined(step)
    dt_fwd = timed_pipelined(fwd)
    dt_1 = timed_single(step)

    rays = WIDTH * HEIGHT * SPP * DEPTH
    mrays = rays / dt / 1e6
    mrays_fwd = rays / dt_fwd / 1e6
    print(json.dumps({
        "metric": "suzanne_fwd_bwd_mrays_per_s_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REF_CPU_MRAYS_MEASURED, 3),
        "fwd_only_mrays_per_s": round(mrays_fwd, 2),
        "single_dispatch_mrays_per_s": round(rays / dt_1 / 1e6, 2),
        "timing": "sustained async-pipelined 4-spp steps (8 in flight; "
                  "single-dispatch number includes the ~25ms tunnel "
                  "RTT of this box's remote TPU — see r5_rtt.py)",
    }))


if __name__ == "__main__":
    main()
