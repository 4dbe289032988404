"""Two-process 'multi-host' rendering on one machine (CPU + gloo).

Validates the N>=2 host path of BASELINE.json without a pod: two
OS processes each own 4 virtual CPU devices, join via
``jax.distributed.initialize``, build the 8-device global mesh, and
render the sharded image; process 0's result must match the
single-process 8-device render bitwise.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as jeb
jeb.clear_backends()
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
sys.path.insert(0, os.getcwd())
from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.scene import compile_scene
from rust_ray_tracer_tpu.ops.camera import make_camera
from rust_ray_tracer_tpu.parallel import make_mesh, render_waves_sharded
from rust_ray_tracer_tpu.parallel.render import replicate_scene

cam = make_camera(np.eye(3, 4, dtype=np.float32), 45.0, 1.0)
sd = compile_scene(S.Scene(cam, [
    S.Sphere((0, 0, -4), 1.2, S.Lambertian.from_rgb(0.6, 0.4, 0.3)),
    S.XYRect(-3.0, 3.0, -3.0, 3.0, 2.0,
             S.DiffuseLight.from_color((4, 4, 4))),
], [], (0.2, 0.3, 0.4)))

mesh = make_mesh()                 # all 8 global devices
sd = replicate_scene(sd, mesh)
img = render_waves_sharded(sd, 24, 16, jax.random.PRNGKey(0), 0, 2, mesh,
                           chunk_size=64)
# replicate the global (sharded) image so every process holds all of it
from jax.sharding import NamedSharding, PartitionSpec as P
rep = jax.jit(lambda x: x,
              out_shardings=NamedSharding(mesh, P()))(img)
local = np.asarray(rep.addressable_shards[0].data)
if pid == 0:
    np.save(out, local)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    if os.environ.get("RRT_SKIP_MULTIPROC") == "1":
        pytest.skip("multi-process test disabled")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    out = str(tmp_path / "img.npy")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), port, out],
        env=env, cwd=os.getcwd(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    two_proc = np.load(out)

    # single-process 8-device reference
    from rust_ray_tracer_tpu.models import scene as S
    from rust_ray_tracer_tpu.models.scene import compile_scene
    from rust_ray_tracer_tpu.ops.camera import make_camera
    from rust_ray_tracer_tpu.parallel import make_mesh, render_waves_sharded
    import jax

    cam = make_camera(np.eye(3, 4, dtype=np.float32), 45.0, 1.0)
    sd = compile_scene(S.Scene(cam, [
        S.Sphere((0, 0, -4), 1.2, S.Lambertian.from_rgb(0.6, 0.4, 0.3)),
        S.XYRect(-3.0, 3.0, -3.0, 3.0, 2.0,
                 S.DiffuseLight.from_color((4, 4, 4))),
    ], [], (0.2, 0.3, 0.4)))
    ref = np.asarray(render_waves_sharded(
        sd, 24, 16, jax.random.PRNGKey(0), 0, 2, make_mesh(n_devices=8),
        chunk_size=64))
    np.testing.assert_array_equal(two_proc, ref)
