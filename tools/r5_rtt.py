"""Round-5: separate device time from tunnel RTT — sweep-length scaling.

Times render_waves one-dispatch sweeps of n_waves in {4, 8, 16, 32}
(fwd + step) plus an async-pipelined 5-deep fwd queue. If ms/wave falls
with sweep length toward an asymptote, the asymptote is the true device
time and the intercept is the fixed per-dispatch overhead.

Run: python tools/r5_rtt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, D = 512, 288, 4
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
    rays1 = W * H * D

    for nw in (4, 8, 16, 32):
        def loss(d, k, s, nw=nw):
            img = render_waves(combine(d, static), W, H, k, s * nw, nw,
                               depth=D, chunk_size=CHUNK)
            return jnp.mean(img)

        fwd = jax.jit(loss)
        step = jax.jit(jax.value_and_grad(loss))
        jax.block_until_ready(fwd(diff, key, 0))
        jax.block_until_ready(step(diff, key, 0))

        def timed(fn, iters=5):
            ts = []
            for i in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(diff, key, i))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        dt_f, dt_s = timed(fwd), timed(step)
        log(f"sweep{nw}: fwd {dt_f * 1000 / nw:.2f} ms/wave "
            f"({rays1 * nw / dt_f / 1e6:.2f} Mrays/s)  step "
            f"{dt_s * 1000 / nw:.2f} ms/wave "
            f"({rays1 * nw / dt_s / 1e6:.2f} Mrays/s)")

    # async-pipelined: 10 independent 4-wave fwd dispatches in flight
    def loss4(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * 4, 4,
                           depth=D, chunk_size=CHUNK)
        return jnp.mean(img)

    fwd4 = jax.jit(loss4)
    jax.block_until_ready(fwd4(diff, key, 0))
    t0 = time.perf_counter()
    outs = [fwd4(diff, key, i) for i in range(10)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    log(f"async 10x4-wave fwd: {dt * 1000 / 40:.2f} ms/wave "
        f"({rays1 * 40 / dt / 1e6:.2f} Mrays/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
