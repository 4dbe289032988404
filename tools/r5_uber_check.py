"""Round-5 TPU batch 1: uber-bounce validation + suzanne timings.

Stages (each prints a flushed line; partial output is useful):
  A. suzanne 256x144 8spp forward parity: uber vs megakernel pipeline
     (must be ~exact — same folds, same plane core, shared streams).
  B. suzanne 512x288 4spp d4 one-dispatch swept fwd + step timings,
     uber ON vs OFF (the bench.py form).

Run: python tools/r5_uber_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

WIDTH, HEIGHT, SPP, DEPTH = 512, 288, 4, 4
CHUNK = 9216


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import __graft_entry__
    from rust_ray_tracer_tpu.models.scene import combine, partition
    from rust_ray_tracer_tpu.ops import pallas_uber as pu
    from rust_ray_tracer_tpu.ops.integrator import render_waves

    log(f"devices: {jax.devices()}")
    scene = __graft_entry__._flagship_scene()
    assert pu.uber_eligible(scene), "suzanne must be uber-eligible"
    key = jax.random.PRNGKey(0)

    # ---- stage A: parity (small frame) ----
    def render_small():
        return np.asarray(render_waves(scene, 256, 144, key, 0, 8,
                                       depth=DEPTH, chunk_size=CHUNK))

    t0 = time.time()
    img_uber = render_small()
    log(f"A: uber small render compiled+ran in {time.time()-t0:.1f}s, "
        f"mean {img_uber.mean():.6f} finite={np.isfinite(img_uber).all()}")
    os.environ["RRT_NO_UBER"] = "1"
    t0 = time.time()
    img_mega = render_small()
    del os.environ["RRT_NO_UBER"]
    log(f"A: mega small render in {time.time()-t0:.1f}s, "
        f"mean {img_mega.mean():.6f}")
    d = np.abs(img_uber - img_mega)
    flips = (d > 1e-3).any(-1)
    rel = d.sum() / max(img_mega.sum(), 1e-9)
    log(f"A: uber-vs-mega maxabs {d.max():.3e} rel_mean {rel:.3e} "
        f"flips {flips.sum()}/{flips.size}")
    if flips.mean() > 0.001:
        log("A: PARITY FAIL — aborting timings")
        return 1

    # ---- stage B: bench-form timings ----
    diff, static = partition(scene)

    def loss_fn(diff, key, sweep):
        img = render_waves(combine(diff, static), WIDTH, HEIGHT, key,
                           sweep * SPP, SPP, depth=DEPTH,
                           chunk_size=CHUNK)
        return jnp.mean(img)

    results = {}
    for name, env in (("uber", None), ("mega", "1")):
        if env:
            os.environ["RRT_NO_UBER"] = env
        try:
            step = jax.jit(jax.value_and_grad(loss_fn))
            fwd = jax.jit(loss_fn)
            t0 = time.time()
            jax.block_until_ready(fwd(diff, key, 0))
            log(f"B[{name}]: fwd compile+run {time.time()-t0:.1f}s")
            t0 = time.time()
            jax.block_until_ready(step(diff, key, 0))
            log(f"B[{name}]: step compile+run {time.time()-t0:.1f}s")

            def timed(fn, iters=5):
                ts = []
                for i in range(iters):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(diff, key, i))
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                return ts[len(ts) // 2]

            dt_f = timed(fwd)
            dt_s = timed(step)
            rays = WIDTH * HEIGHT * SPP * DEPTH
            results[name] = {
                "fwd_ms_per_wave": round(dt_f * 1000 / SPP, 2),
                "step_ms_per_wave": round(dt_s * 1000 / SPP, 2),
                "fwd_mrays": round(rays / dt_f / 1e6, 2),
                "step_mrays": round(rays / dt_s / 1e6, 2),
            }
            log(f"B[{name}]: {results[name]}")
        finally:
            os.environ.pop("RRT_NO_UBER", None)

    print(json.dumps({"stage": "r5_uber_check", "results": results}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
