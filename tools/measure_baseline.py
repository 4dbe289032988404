"""Measure the reference-CPU baseline for bench.py's vs_baseline ratio.

Dumps the suzanne triangles through our glTF loader, builds
tools/ref_baseline.cpp with -O3, runs it at 1 thread and at all cores,
and prints the derivation. See BASELINE.md "vs_baseline derivation".
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_ray_tracer_tpu.models.gltf import load_gltf_scene  # noqa: E402
from rust_ray_tracer_tpu.models.scene import compile_scene  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sd = compile_scene(load_gltf_scene(
        "/root/reference/assets/suzanne.gltf", 16 / 9))
    n = int(np.asarray(sd.tri_double).shape[0])
    # drop pad rows (zero edges)
    e1 = np.asarray(sd.tri_e1)
    real = ~np.all((e1 == 0) & (np.asarray(sd.tri_e2) == 0), axis=1)
    tris = np.concatenate([np.asarray(sd.tri_v0)[real],
                           np.asarray(sd.tri_e1)[real],
                           np.asarray(sd.tri_e2)[real]],
                          axis=1).astype(np.float32)
    tris.tofile("/tmp/suzanne_tris.f32")
    # the real glTF camera (c2w 3x4, tan(vfov/2), aspect) so the C++
    # tracer renders the same framing the reference renders
    cam = np.concatenate([np.asarray(sd.camera.c2w).reshape(-1),
                          [float(sd.camera.scale)],
                          [float(sd.camera.aspect)]]).astype(np.float32)
    cam.tofile("/tmp/suzanne_cam.f32")
    print(f"dumped {tris.shape[0]}/{n} real triangles")

    subprocess.check_call(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o",
         "/tmp/ref_baseline", os.path.join(ROOT, "tools/ref_baseline.cpp"),
         "-lpthread"])
    for threads in (1, os.cpu_count()):
        out = subprocess.check_output(
            ["/tmp/ref_baseline", "/tmp/suzanne_tris.f32", str(threads)])
        r = json.loads(out)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
