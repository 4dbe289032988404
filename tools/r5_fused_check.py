"""Round-5 TPU batch: ONE-kernel fused uber bounce vs the two-kernel path.

Stages (flushed lines; partial output useful):
  A. fused-vs-two-kernel image parity on suzanne (fwd, 2 waves).
  B. bench-form fwd + step timings, both paths.
  C. grad parity (step) fused vs two-kernel.

Run: python tools/r5_fused_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
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

    log(f"devices: {jax.devices()}")
    scene = __graft_entry__._flagship_scene()
    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)

    def make_fns():
        # fresh function objects per env setting -> separate jit caches
        def loss(d, k, s):
            img = render_waves(combine(d, static), W, H, k, s * SPP, SPP,
                               depth=D, chunk_size=CHUNK)
            return jnp.mean(img), img

        fwd = jax.jit(lambda d, k, s: loss(d, k, s)[1])
        step = jax.jit(jax.value_and_grad(
            lambda d, k, s: loss(d, k, s)[0]))
        return fwd, step

    def timed(fn, *a, iters=5):
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a[:-1], a[-1] + i))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    rays = W * H * SPP * D
    results = {}
    for tag, env in (("fused", None), ("twok", "1")):
        if env:
            os.environ["RRT_NO_UBER_FUSED"] = env
        else:
            os.environ.pop("RRT_NO_UBER_FUSED", None)
        fwd, step = make_fns()
        t0 = time.time()
        img = jax.block_until_ready(fwd(diff, key, 0))
        log(f"{tag}: fwd compile+run {time.time() - t0:.1f}s")
        t0 = time.time()
        _, g = jax.block_until_ready(step(diff, key, 0))
        log(f"{tag}: step compile+run {time.time() - t0:.1f}s")
        dt_f = timed(fwd, diff, key, 0)
        dt_s = timed(step, diff, key, 0)
        log(f"{tag}: fwd {dt_f * 1000 / SPP:.2f} ms/wave "
            f"({rays / dt_f / 1e6:.2f} Mrays/s)  step "
            f"{dt_s * 1000 / SPP:.2f} ms/wave "
            f"({rays / dt_s / 1e6:.2f} Mrays/s)")
        results[tag] = (np.asarray(img), g)

    a, ga = results["fused"]
    b, gb = results["twok"]
    d = np.abs(a - b)
    log(f"A: image maxabs {d.max():.3e}  flips>1e-3 "
        f"{(d > 1e-3).any(-1).mean():.5f}")
    for name in ("tri_v0", "sph_c0", "tex_color", "mat_fuzz", "mat_ior",
                 "background", "light_q"):
        x = np.asarray(getattr(ga, name))
        y = np.asarray(getattr(gb, name))
        rel = (np.abs(x - y).max()
               / max(np.abs(y).max(), 1e-12)) if y.size else 0.0
        log(f"C: grad {name}: rel {rel:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
