"""Round-5 TPU batch: uber-path suzanne timings + per-op self-time traces.

Stages (flushed lines; partial output useful):
  A. bench-form fwd + step timings (uber ON — the default route).
  B. fwd device trace -> self-time table (tools/r4_trace_scene.selftime).
  C. step device trace -> self-time table.

Run: python tools/r5_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, SPP, D = 512, 288, 4, 4
CHUNK = 9216


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import __graft_entry__
    from rust_ray_tracer_tpu.models.scene import combine, partition
    from rust_ray_tracer_tpu.ops.integrator import render_waves
    from tools.r4_trace_scene import selftime

    log(f"devices: {jax.devices()}")
    scene = __graft_entry__._flagship_scene()
    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)

    def loss(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * SPP, SPP,
                           depth=D, chunk_size=CHUNK)
        return jnp.mean(img)

    fwd = jax.jit(loss)
    step = jax.jit(jax.value_and_grad(loss))

    t0 = time.time()
    jax.block_until_ready(fwd(diff, key, 0))
    log(f"A: fwd compile+run {time.time() - t0:.1f}s")
    t0 = time.time()
    jax.block_until_ready(step(diff, key, 0))
    log(f"A: step compile+run {time.time() - t0:.1f}s")

    def timed(fn, iters=5):
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(diff, key, i))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    rays = W * H * SPP * D
    dt_f, dt_s = timed(fwd), timed(step)
    log(f"A: fwd {dt_f * 1000 / SPP:.2f} ms/wave ({rays / dt_f / 1e6:.2f}"
        f" Mrays/s)  step {dt_s * 1000 / SPP:.2f} ms/wave "
        f"({rays / dt_s / 1e6:.2f} Mrays/s)")

    for tag, fn in (("fwd", fwd), ("step", step)):
        td = f"/tmp/r5_trace_{tag}"
        os.system(f"rm -rf {td}")
        jax.profiler.start_trace(td)
        for i in range(3):
            jax.block_until_ready(fn(diff, key, i))
        jax.profiler.stop_trace()
        log(f"--- suzanne uber {tag} self-time (12 waves) ---")
        selftime(td, 3 * SPP, top=40)

    return 0


if __name__ == "__main__":
    sys.exit(main())
