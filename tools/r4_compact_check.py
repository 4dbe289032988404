"""Round-4 measurement: cross-chunk compaction on suzanne + bigmesh.

Round-3's r3_tpu_check measured compact only on `random` (step 1078.8
-> 778.9 ms, 1.38x). VERDICT round-3 item 3: suzanne kills ~93% of
primary rays at bounce 0 and bigmesh ~idem — the bounce-major wave
should collapse bounces 1-3 there too. All timings are the swept
one-dispatch 4-wave form (dispatch RTT measured at ~32 ms/dispatch on
this tunnel — r3_tpu_check phase 2), reported per wave.

Also ablates the sub-cluster hierarchy on bigmesh (it REGRESSED in
r3_tpu_check: 1476.5 sub vs 1396.6 nosub) combined with compact.
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import combine, compile_scene, partition
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D = 512, 288, 4
RAYS_PER_WAVE = W * H * D


def log(*a):
    print("R4COMPACT", *a, flush=True)


def timed_swept(fn, *args, iters=3):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, i))
        ts.append((time.perf_counter() - t0) / 4)
    ts.sort()
    return ts[len(ts) // 2]


def measure(tag, sd, compact, do_step=True):
    diff, static = partition(sd)

    def loss(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * 4, 4,
                           depth=D, chunk_size=9216, compact=compact)
        return jnp.mean(img)

    key = jax.random.PRNGKey(0)
    fwd = jax.jit(loss)
    jax.block_until_ready(fwd(diff, key, 0))
    ms = timed_swept(fwd, diff, key) * 1e3
    log(f"{tag} fwd ms/wave", round(ms, 1), "Mrays/s",
        round(RAYS_PER_WAVE / ms / 1e3, 2))
    if not do_step:
        return ms
    step = jax.jit(jax.value_and_grad(loss))
    jax.block_until_ready(step(diff, key, 0))
    sms = timed_swept(step, diff, key) * 1e3
    log(f"{tag} step ms/wave", round(sms, 1), "Mrays/s",
        round(RAYS_PER_WAVE / sms / 1e3, 2))
    return ms


def main():
    suz = compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", W / H))
    for compact in (False, True):
        tag = f"suzanne compact={int(compact)}"
        try:
            measure(tag, suz, compact)
        except Exception:
            log(tag, "FAILED"); traceback.print_exc()

    path = ("/root/reference/assets/MetalRoughSpheres/"
            "MetalRoughSpheres.gltf")
    if not os.path.exists(path):
        log("bigmesh asset missing, skipped")
        return
    big = compile_scene(load_gltf_scene(path, W / H))
    # fwd for all 4 combos first; step only for the fwd winner (each
    # bigmesh compile is minutes — don't spend 8 of them)
    results = {}
    for nosub in (True, False):
        if nosub:
            os.environ["RRT_NO_SUB"] = "1"
        for compact in (False, True):
            tag = f"bigmesh nosub={int(nosub)} compact={int(compact)}"
            try:
                results[(nosub, compact)] = measure(
                    tag, big, compact, do_step=False)
            except Exception:
                log(tag, "FAILED"); traceback.print_exc()
        if nosub:
            del os.environ["RRT_NO_SUB"]
    if results:
        (nosub, compact) = min(results, key=results.get)
        log(f"bigmesh fwd winner: nosub={int(nosub)} "
            f"compact={int(compact)}")
        if nosub:
            os.environ["RRT_NO_SUB"] = "1"
        try:
            measure(f"bigmesh WINNER nosub={int(nosub)} "
                    f"compact={int(compact)}", big, compact)
        except Exception:
            log("bigmesh winner step FAILED"); traceback.print_exc()
        if nosub:
            del os.environ["RRT_NO_SUB"]
    log("done")


if __name__ == "__main__":
    main()
