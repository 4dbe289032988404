"""Round-5: RRT_CHUNK_UNROLL sweep on suzanne (uber path).

The r5 trace showed a ~6-7 ms/wave wall-minus-device idle gap from the
sequential chunk scan's per-iteration issue latency; unroll>1 places
several chunk bodies per loop iteration so their kernels overlap.

Run: python tools/r5_unroll.py [unroll values...]
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

    vals = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    scene = __graft_entry__._flagship_scene()
    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)
    rays = W * H * SPP * D

    for u in vals:
        os.environ["RRT_CHUNK_UNROLL"] = str(u)

        def loss(d, k, s):
            img = render_waves(combine(d, static), W, H, k, s * SPP, SPP,
                               depth=D, chunk_size=CHUNK)
            return jnp.mean(img)

        fwd = jax.jit(loss)
        step = jax.jit(jax.value_and_grad(loss))
        t0 = time.time()
        jax.block_until_ready(fwd(diff, key, 0))
        jax.block_until_ready(step(diff, key, 0))
        log(f"unroll={u}: compiles {time.time() - t0:.1f}s")

        def timed(fn, iters=5):
            ts = []
            for i in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(diff, key, i))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        dt_f, dt_s = timed(fwd), timed(step)
        log(f"unroll={u}: fwd {dt_f * 1000 / SPP:.2f} ms/wave "
            f"({rays / dt_f / 1e6:.2f} Mrays/s)  step "
            f"{dt_s * 1000 / SPP:.2f} ms/wave "
            f"({rays / dt_s / 1e6:.2f} Mrays/s)")
    os.environ.pop("RRT_CHUNK_UNROLL", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
