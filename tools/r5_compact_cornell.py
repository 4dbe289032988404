"""Round-5: measure compact-vs-uber routing on the auto_compact scenes.

VERDICT r4 #5: auto_compact defaults cornell_box/cornell_triangle to
compact with zero cornell hardware measurements. Since r5 the question
changed shape: compact=True BYPASSES the whole-wave uber kernel
(integrator.render_waves routes uber only when ``not compact``), so for
uber-eligible scenes the real choice is {uber wave, compact split path,
plain split path}. This measures all three per scene on hardware.

Scenes: cornell_box, cornell_triangle (auto=True, unmeasured),
random (auto=True, r4-measured 1.38x on the SPLIT path — does uber beat
it?). suzanne is the bench scene (uber measured 83 Mrays/s).

Timing form: async-pipelined dispatch (8 in flight) per CLAUDE.md —
short one-dispatch timings pay ~25ms tunnel RTT and misread 2-3x.

Run: python tools/r5_compact_cornell.py [scene ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, D, CHUNK = 512, 288, 4, 9216
PIPE, REPS = 8, 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def measure(scene_name, mode):
    """mode: 'uber' (compact=False, uber route), 'compact', 'plain'
    (RRT_NO_UBER=1 split path)."""
    from rust_ray_tracer_tpu.models import builders
    from rust_ray_tracer_tpu.models.scene import compile_scene, combine, partition
    from rust_ray_tracer_tpu.ops.integrator import render_waves

    scene = compile_scene(builders.get_scene(scene_name, W / H))
    diff, static = partition(scene)
    compact = mode == "compact"

    def loss(d_, k):
        img = render_waves(combine(d_, static), W, H, k, 0, 1,
                           depth=D, chunk_size=CHUNK, compact=compact)
        return jnp.mean(img)

    fwd = jax.jit(loss)
    step = jax.jit(jax.value_and_grad(loss))
    keys = [jax.random.PRNGKey(i) for i in range(PIPE)]
    out = {}
    for tag, fn in (("fwd", fwd), ("step", step)):
        r = fn(diff, keys[0])
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            outs = [fn(diff, k) for k in keys]     # async pipeline
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / PIPE * 1000)
        out[tag] = best
    rays = W * H * sum(0.5 ** i for i in range(D))  # upper bound; report ms
    log(f"{scene_name} {mode}: fwd {out['fwd']:.2f} ms/wave, "
        f"step {out['step']:.2f} ms/wave")
    return out


def main():
    scenes = sys.argv[1:] or ["cornell_box", "cornell_triangle", "random"]
    results = {}
    for s in scenes:
        for mode in ("uber", "compact", "plain"):
            if mode == "plain":
                os.environ["RRT_NO_UBER"] = "1"
            else:
                os.environ.pop("RRT_NO_UBER", None)
            try:
                results[(s, mode)] = measure(s, mode)
            except Exception as e:  # keep the batch going
                log(f"{s} {mode}: FAILED {type(e).__name__}: {e}")
    os.environ.pop("RRT_NO_UBER", None)
    log("summary:")
    for (s, mode), r in results.items():
        log(f"  {s:18s} {mode:8s} fwd {r['fwd']:8.2f}  step {r['step']:8.2f}")


if __name__ == "__main__":
    main()
