"""Device trace + per-op SELF-time table for any bench scene.

Usage: python tools/r4_trace_scene.py <scene> [--step] [--compact]
  scene: random | final_scene | composite | suzanne | bigmesh

Self time = an op's duration minus its children's (the xprof 'XLA Ops'
lane nests while/cond/fusion spans), so the table attributes real
device time per HLO op — what tools/r4_suzanne.py used to find the
round-4 gather bottleneck.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H, D, SPP = 512, 288, 4, 4


def get_scene(name):
    from rust_ray_tracer_tpu.models.scene import compile_scene
    if name == "suzanne":
        from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
        return compile_scene(load_gltf_scene(
            "/root/reference/assets/suzanne.gltf", W / H))
    if name == "bigmesh":
        from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
        return compile_scene(load_gltf_scene(
            "/root/reference/assets/MetalRoughSpheres/"
            "MetalRoughSpheres.gltf", W / H))
    from rust_ray_tracer_tpu.models import builders
    return compile_scene(builders.get_scene(name, W / H))


def selftime(path, n_waves, top=35):
    p = sorted(glob.glob(path + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pid_name, tid_name = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"]["name"]
            if e.get("name") == "thread_name":
                tid_name[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in ev if e.get("ph") == "X" and "dur" in e
           and pid_name.get(e["pid"]) == "/device:TPU:0"
           and tid_name.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack = []
    self_us = defaultdict(float)
    n = defaultdict(int)
    src = {}
    for e in ops:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_us[stack[-1][2]] -= dur
        self_us[e["name"]] += dur
        n[e["name"]] += 1
        a = e.get("args", {})
        src[e["name"]] = (str(a.get("hlo_category", ""))[:14],
                          str(a.get("source", ""))[-42:],
                          str(a.get("tf_op", ""))[-50:])
        stack.append((ts, dur, e["name"]))
    total = sum(self_us.values())
    print(f"TOTAL self {total / 1e3:.1f} ms over {n_waves} waves "
          f"= {total / n_waves / 1e3:.2f} ms/wave", flush=True)
    for name, d in sorted(self_us.items(), key=lambda kv: -kv[1])[:top]:
        c, s, t = src[name]
        print(f"  {d / 1e3:8.2f} ms ({n[name]:6d}x) {name[:30]:30s} "
              f"{c:14s} {s} {t}", flush=True)


def main():
    name = sys.argv[1]
    do_step = "--step" in sys.argv
    compact = "--compact" in sys.argv
    from rust_ray_tracer_tpu.models.scene import combine, partition
    from rust_ray_tracer_tpu.ops.integrator import render_waves
    sd = get_scene(name)
    diff, static = partition(sd)
    key = jax.random.PRNGKey(0)

    def loss(d, k, s):
        img = render_waves(combine(d, static), W, H, k, s * SPP, SPP,
                           depth=D, chunk_size=9216, compact=compact)
        return jnp.mean(img)

    fn = jax.jit(jax.value_and_grad(loss)) if do_step else jax.jit(loss)
    jax.block_until_ready(fn(diff, key, 0))
    iters = 3 if name not in ("bigmesh",) else 1
    td = f"/tmp/r4_trace_{name}{'_step' if do_step else ''}"
    os.system(f"rm -rf {td}")
    jax.profiler.start_trace(td)
    for i in range(iters):
        jax.block_until_ready(fn(diff, key, i))
    jax.profiler.stop_trace()
    print(f"--- {name} {'step' if do_step else 'fwd'} compact={compact} "
          f"({iters * SPP} waves) ---", flush=True)
    selftime(td, iters * SPP)


if __name__ == "__main__":
    main()
