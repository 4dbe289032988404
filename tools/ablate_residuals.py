"""TPU ablation: which named remat residuals should the bounce save?

Sweeps SAVE_NAMES combinations over the suzanne bench step in one
device session (backend variance cancels). Saving a residual trades
forward materialization (HBM write XLA would otherwise fuse away)
against backward recompute; the winner is an empirical question per
workload — record results in the SAVE_NAMES comment (ops/integrator.py).

Usage: python tools/ablate_residuals.py [scene ...]
(default: the suzanne flagship; any builders.get_scene name works)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__  # noqa: E402
from rust_ray_tracer_tpu.models.scene import combine, partition  # noqa: E402
from rust_ray_tracer_tpu.ops import integrator as I  # noqa: E402

WIDTH, HEIGHT, DEPTH, CHUNK = 512, 288, 4, 9216

COMBOS = [
    ("isect_sel",),
    ("isect_sel", "shade_rand"),
    ("isect_sel", "isect_packs"),
    ("isect_sel", "hit_attrs"),
    ("isect_sel", "hit_attrs", "albedo"),
    ("isect_sel", "isect_packs", "hit_attrs", "albedo", "shade_rand"),
]


def main():
    names = sys.argv[1:] or ["suzanne"]
    for name in names:
        run_scene(name)


def run_scene(name):
    if name == "suzanne":
        scene = __graft_entry__._flagship_scene()
    else:
        from rust_ray_tracer_tpu.models import builders
        from rust_ray_tracer_tpu.models.scene import compile_scene
        scene = compile_scene(builders.get_scene(name, WIDTH / HEIGHT))
    diff, static = partition(scene)
    key = jax.random.PRNGKey(0)

    def loss_fn(diff, key, wave):
        img = I.render_waves(combine(diff, static), WIDTH, HEIGHT, key,
                             wave, 1, depth=DEPTH, chunk_size=CHUNK)
        return jnp.mean(img)

    rays = WIDTH * HEIGHT * DEPTH
    for names in COMBOS:
        I.SAVE_NAMES = names
        step = jax.jit(jax.value_and_grad(loss_fn))
        jax.block_until_ready(step(diff, key, 0))
        t0 = time.perf_counter()
        for w in range(1, 9):
            jax.block_until_ready(step(diff, key, w))
        dt = (time.perf_counter() - t0) / 8
        print(json.dumps({"scene": name, "save": list(names),
                          "step_ms": round(dt * 1e3, 2),
                          "step_mrays": round(rays / dt / 1e6, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
