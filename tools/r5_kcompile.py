"""Micro: compile-time bisect of the fused uber kernel on TPU.

Compiles bounce_uber on ONE tiny chunk (1024 rays) for the test solid
scene, fused vs two-kernel, fwd and grad — prints wall compile times.

Run: python tools/r5_kcompile.py [fused|twok|both]
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from rust_ray_tracer_tpu.models import scene as S
    from rust_ray_tracer_tpu.models.scene import (combine, compile_scene,
                                                  partition)
    from rust_ray_tracer_tpu.ops import pallas_uber as pu
    from rust_ray_tracer_tpu.ops.camera import make_camera
    from rust_ray_tracer_tpu.utils import rng as rngu

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cam = make_camera(np.eye(3, 4, dtype=np.float32), 60.0, 1.0)
    world = [
        S.Sphere((0, 0, -4), 1.0, S.Lambertian.from_rgb(0.5, 0.4, 0.3)),
        S.Triangle((-3, -1.2, -2), (3, -1.2, -2), (0, -1.2, -8),
                   S.Lambertian.from_rgb(0.7, 0.7, 0.7),
                   double_sided=True),
        S.XZRect(-1.0, 1.0, -5.0, -3.0, 3.0,
                 S.DiffuseLight.from_color((5, 5, 5))),
    ]
    sd = compile_scene(S.Scene(cam, world, [world[-1]], (0.2, 0.3, 0.5)))
    diff, static = partition(sd)
    log(f"devices: {jax.devices()}")

    c = 1024
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((c, 3)) + jnp.array([0.0, 0.0, 0.0])
    d = jax.random.normal(key, (c, 3))
    t = jnp.zeros((c,))

    for tag, env in (("fused", None), ("twok", "1")):
        if which not in (tag, "both"):
            continue
        if env:
            os.environ["RRT_NO_UBER_FUSED"] = env
        else:
            os.environ.pop("RRT_NO_UBER_FUSED", None)

        def fwd(dd, o, d, t):
            sc = combine(dd, static)
            st, _ = pu.pack_state(o, d, t, jnp.zeros((c, 3)),
                                  jnp.ones((c, 3)), jnp.ones((c,), bool))
            st2 = pu.bounce_uber(sc, rngu.bounce_key(key, 0), st)
            return jnp.sum(st2[8:11])

        t0 = time.time()
        jax.block_until_ready(jax.jit(fwd)(diff, o, d, t))
        log(f"{tag}: fwd bounce compile+run {time.time() - t0:.1f}s")
        t0 = time.time()
        jax.block_until_ready(
            jax.jit(jax.grad(fwd))(diff, o, d, t))
        log(f"{tag}: grad bounce compile+run {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
