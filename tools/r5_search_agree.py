"""Pin the drift class behind the random-scene parity flips: do the
pallas search kernel and the XLA candidate sweep pick DIFFERENT winners
on the same rays (search boundary flips), or do they agree and the
image drift comes from continuous fp differences amplified over curved
bounces (shade-math class)?

Compares phase-1 output (kind, idx, found) of pk.fused_search vs the
pure-XLA candidates on one chunk of camera primaries + one chunk of
post-bounce-like jittered rays, for random / suzanne / composite.

Run: python tools/r5_search_agree.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

C = 9216


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def winners(scene, o, d, t):
    """(hit, kind, idx) through both phase-1 backends, via the SAME
    intersect_select entry the renderer uses (env-toggled)."""
    from rust_ray_tracer_tpu.ops.intersect import intersect_select

    def sel(o, d, t):
        s = intersect_select(scene, o, d, t)
        return s.hit, s.kind, s.idx

    os.environ.pop("RRT_NO_PALLAS", None)
    h_p, k_p, i_p = jax.jit(sel)(o, d, t)
    os.environ["RRT_NO_PALLAS"] = "1"
    h_x, k_x, i_x = jax.jit(lambda o, d, t: sel(o, d, t))(o, d, t)
    os.environ.pop("RRT_NO_PALLAS", None)
    return [np.asarray(jax.block_until_ready(x))
            for x in (h_x, k_x, i_x, h_p, k_p, i_p)]


def probe(name, aspect=16 / 9):
    from rust_ray_tracer_tpu.models import builders
    from rust_ray_tracer_tpu.models.scene import compile_scene
    from rust_ray_tracer_tpu.ops.camera import camera_rays_for_chunk

    scene = compile_scene(builders.get_scene(name, aspect))
    key = jax.random.PRNGKey(0)
    # chunk 0 camera primaries
    o, d, t, _ = camera_rays_for_chunk(scene.camera, key, 0, C, 256, 144)
    for tag in ("primary", "jittered"):
        if tag == "jittered":   # post-bounce-like: perturbed origins/dirs
            k1, k2 = jax.random.split(key)
            o = o + jax.random.normal(k1, o.shape) * 0.5
            d = d + jax.random.normal(k2, d.shape) * 0.05
        fx, kx, ix_, fp, kp, ip = winners(scene, o, d, t)
        found_dis = int((fx != fp).sum())
        both = fx & fp
        kind_dis = int((kx[both] != kp[both]).sum())
        idx_dis = int(((kx[both] == kp[both])
                       & (ix_[both] != ip[both])).sum())
        log(f"{name}/{tag}: found-mismatch {found_dis}/{C}  "
            f"kind-mismatch {kind_dis}  idx-mismatch {idx_dis}  "
            f"agree {int(both.sum())} hits")


def main():
    for name in sys.argv[1:] or ["random", "composite"]:
        probe(name)


if __name__ == "__main__":
    main()
