"""Round-5 TPU sweep: fused-uber dispatch shape on suzanne.

Configs: {default, RRT_UBER_XRND=1 (hoisted threefry)} x chunk size
{9216, 18432, 36864} (+ RRT_CHUNK_UNROLL on the winner). Targets the
measured ~6 ms/wave wall-vs-device idle gap (r5 trace): fewer, bigger
loop iterations and fewer ops per iteration.

Run: python tools/r5_sweep.py
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
    rays = W * H * SPP * D

    def run(tag, chunk, env=None):
        old = {}
        for k, v in (env or {}).items():
            old[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            def loss(d, k, s):
                img = render_waves(combine(d, static), W, H, k, s * SPP,
                                   SPP, depth=D, chunk_size=chunk)
                return jnp.mean(img)

            fwd = jax.jit(loss)
            step = jax.jit(jax.value_and_grad(loss))
            t0 = time.time()
            jax.block_until_ready(fwd(diff, key, 0))
            c1 = time.time() - t0
            t0 = time.time()
            jax.block_until_ready(step(diff, key, 0))
            c2 = time.time() - t0

            def timed(fn, iters=5):
                ts = []
                for i in range(iters):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(diff, key, i))
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                return ts[len(ts) // 2]

            dt_f, dt_s = timed(fwd), timed(step)
            log(f"{tag}: compile {c1:.0f}/{c2:.0f}s  fwd "
                f"{dt_f * 1000 / SPP:.2f} ms/wave ({rays / dt_f / 1e6:.2f}"
                f" Mrays/s)  step {dt_s * 1000 / SPP:.2f} ms/wave "
                f"({rays / dt_s / 1e6:.2f} Mrays/s)")
            return dt_s
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    run("chunk9216", 9216)
    run("chunk9216+xrnd", 9216, {"RRT_UBER_XRND": "1"})
    run("chunk18432", 18432)
    run("chunk36864", 36864)
    run("chunk18432+xrnd", 18432, {"RRT_UBER_XRND": "1"})
    run("chunk36864+xrnd", 36864, {"RRT_UBER_XRND": "1"})
    run("chunk9216+unroll4", 9216, {"RRT_CHUNK_UNROLL": "4"})
    return 0


if __name__ == "__main__":
    sys.exit(main())
