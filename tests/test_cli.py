"""CLI driver: argument surface + end-to-end render to PNG."""

import numpy as np
import pytest

from rust_ray_tracer_tpu.utils import image as im
from rust_ray_tracer_tpu.utils.cli import build_parser, main


def test_parser_reference_surface():
    """Positional HEIGHT SAMPLES + -o/-g/-a flags (main.rs:28-40)."""
    a = build_parser().parse_args(
        ["128", "32", "-o", "x.png", "-g", "s.gltf", "-a", "1.5"])
    assert (a.height, a.samples) == (128, 32)
    assert a.output == "x.png" and a.gltf == "s.gltf" and a.aspect == 1.5
    assert a.depth == 4            # reference MAX_DEPTH


def test_render_procedural_scene(tmp_path):
    out = tmp_path / "cornell.png"
    rc = main(["16", "2", "--scene", "cornell_box", "-a", "1.0",
               "-o", str(out), "--chunk-size", "256", "--devices", "1",
               "--checkpoint", str(tmp_path / "c.ckpt")])
    assert rc == 0
    img = im.decode_png(out.read_bytes())
    assert img.shape == (16, 16, 3)
    assert img.max() > 0


def test_render_gltf(tmp_path):
    import os
    src = "/root/reference/assets/default.gltf"
    if not os.path.exists(src):
        pytest.skip("reference assets not mounted")
    out = tmp_path / "cube.png"
    rc = main(["18", "1", "-g", src, "-o", str(out), "--chunk-size", "512",
               "--devices", "1", "--checkpoint", str(tmp_path / "g.ckpt")])
    assert rc == 0
    assert im.decode_png(out.read_bytes()).shape == (18, 32, 3)


def test_missing_scene_args_errors():
    assert main(["16", "1"]) == 2


def test_sharded_cli(tmp_path):
    # NOTE scene choice: several procedural scenes (two_spheres, random, …)
    # render pure sky — the reference feeds glam's look_at_rh (world->view)
    # in as camera-to-world (scene.rs:417-418), a pose quirk we replicate;
    # upstream never saw it because USE_GLTF=true is hardcoded
    # (main.rs:67). cornell_box's near-axis-aligned pose survives it.
    out = tmp_path / "s.png"
    rc = main(["16", "2", "--scene", "cornell_box", "-a", "1.0",
               "-o", str(out), "--chunk-size", "64", "--devices", "4",
               "--checkpoint", str(tmp_path / "s.ckpt")])
    assert rc == 0
    img = im.decode_png(out.read_bytes())
    assert img.shape == (16, 16, 3)
    assert np.unique(img.reshape(-1, 3), axis=0).shape[0] > 3
