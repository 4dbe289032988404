"""Round-4 bigmesh experiments: per-call search-kernel cost levers.

Trace evidence (tools/r4_trace_scene.py, 2026-08-19): the fused search
kernel is 91% of the 1M-tri wave (4772.8 of 5263.4 ms / 4 waves);
bounce-0 primary calls cost 20-40 ms/chunk while compacted bounce-1..3
calls cost 65-257 ms — the alive-first partition mixes rays from every
chunk, so origin-Morton tiles of diffuse rays have half-space frusta
and huge survivor unions.

Levers measured here (fwd, flat clusters, 512x288 d4, swept form):
  A. direction-octant prefix in intersect._search_order (landed):
     direction-coherent tiles -> cone frusta on bounce rays.
  B. in-kernel coeff build (packed, 40B/tri) vs streamed coeff tables
     (160B/tri): the build is re-done per (tile, cluster) step, so if
     it dominates per-step cost, streaming wins despite 4x DMA.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops import pallas_intersect as pk
from rust_ray_tracer_tpu.ops.integrator import render_waves

W, H, D = 512, 288, 4


def log(*a):
    print("R4BIG", *a, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    sd = compile_scene(load_gltf_scene(
        "/root/reference/assets/MetalRoughSpheres/MetalRoughSpheres.gltf",
        W / H))
    for tag, packed, compact in (("packed_compact", None, True),
                                 ("streamed_compact", False, True),
                                 ("packed_plain", None, False),
                                 ("streamed_plain", False, False)):
        pk.INKERNEL_COEFFS = packed

        def fwd(s, k_, w):
            img = render_waves(s, W, H, k_, w * 4, 4, depth=D,
                               chunk_size=9216, compact=compact)
            return jnp.mean(img)

        try:
            f = jax.jit(fwd)
            float(f(sd, key, 0))   # fetch the scalar: through the axon
            ts = []                # tunnel block_until_ready alone can
            for i in range(3):     # return before execution finishes
                t0 = time.perf_counter()
                float(f(sd, key, i))
                ts.append((time.perf_counter() - t0) / 4)
            ts.sort()
            dt = ts[1]
            log(tag, "fwd ms/wave", round(dt * 1e3, 1), "mrays",
                round(W * H * D / dt / 1e6, 2))
        except Exception as e:
            log(tag, "FAILED", type(e).__name__, str(e)[:200])
        finally:
            pk.INKERNEL_COEFFS = None
    log("done")


if __name__ == "__main__":
    main()
