"""Roofline attribution for suzanne + bigmesh (VERDICT r3 item 4).

bench_scenes.py emits MFU%/HBM-BW% for random/final_scene/composite;
this covers the other two bench scenes with the SAME graphs (and so the
same compile-cache entries) as tools/r4_compact_check.py: the
one-dispatch 4-wave swept loss. Prints one JSON line per (scene, probe)
with XLA cost_analysis flops/bytes and the measured ms, normalized per
wave.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D, SPP = 512, 288, 4, 4
RAYS_PER_WAVE = W * H * D
V5E_BF16_FLOPS = 394e12 / 2
V5E_HBM_BPS = 819e9


def probe(name, sd, compact):
    diff, static = partition(sd)
    key = jax.random.PRNGKey(0)

    def loss(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * SPP, SPP,
                           depth=D, chunk_size=9216, compact=compact)
        return jnp.mean(img)

    for tag, fn in (("fwd", jax.jit(loss)),
                    ("step", jax.jit(jax.value_and_grad(loss)))):
        try:
            c = fn.lower(diff, key, 0).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            flops = float(c.get("flops", -1.0)) / SPP
            byts = float(c.get("bytes accessed", -1.0)) / SPP
        except Exception as e:
            flops = byts = -1.0
            print(json.dumps({"scene": name, "probe": tag,
                              "cost_error": str(e)[:120]}), flush=True)
        jax.block_until_ready(fn(diff, key, 0))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(diff, key, i))
            ts.append((time.perf_counter() - t0) / SPP)
        ts.sort()
        dt = ts[len(ts) // 2]
        out = {"scene": name, "probe": tag, "compact": compact,
               "ms_per_wave": round(dt * 1e3, 2),
               "mrays_per_s": round(RAYS_PER_WAVE / dt / 1e6, 2),
               "flops_per_wave": flops, "bytes_per_wave": byts}
        if flops > 0:
            out["mfu_pct"] = round(flops / dt / V5E_BF16_FLOPS * 100, 2)
            out["hbm_bw_pct"] = round(byts / dt / V5E_HBM_BPS * 100, 2)
        print(json.dumps(out), flush=True)


def main():
    suz = compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", W / H))
    probe("suzanne", suz, compact=False)
    path = ("/root/reference/assets/MetalRoughSpheres/"
            "MetalRoughSpheres.gltf")
    if os.path.exists(path):
        os.environ["RRT_NO_SUB"] = "1"
        big = compile_scene(load_gltf_scene(path, W / H))
        probe("bigmesh", big, compact=True)
        del os.environ["RRT_NO_SUB"]


if __name__ == "__main__":
    main()
