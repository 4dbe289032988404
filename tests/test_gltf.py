"""glTF importer vs the bundled reference assets (gltf.rs parity + fixes)."""

import os

import numpy as np
import pytest

from rust_ray_tracer_tpu.models import scene as S
from rust_ray_tracer_tpu.models.gltf import load_gltf_scene
from rust_ray_tracer_tpu.models.scene import compile_scene

ASSETS = "/root/reference/assets"
needs_assets = pytest.mark.skipif(not os.path.isdir(ASSETS),
                                  reason="reference assets not mounted")


@needs_assets
class TestDefaultCube:
    def scene(self):
        return load_gltf_scene(os.path.join(ASSETS, "default.gltf"), 16 / 9)

    def test_counts(self):
        sc = self.scene()
        tris = [o for o in sc.world if isinstance(o, S.Triangle)]
        sphs = [o for o in sc.world if isinstance(o, S.Sphere)]
        assert len(tris) == 12          # cube
        assert len(sphs) == 1           # punctual light -> emissive sphere
        assert len(sc.lights) == 1

    def test_light_mapping(self):
        """point light -> Sphere(r=0.2, emit=color*intensity)
        (gltf.rs:287-299)."""
        sc = self.scene()
        lt = sc.lights[0]
        assert isinstance(lt, S.Sphere)
        np.testing.assert_allclose(lt.radius, 0.2)
        assert isinstance(lt.material, S.DiffuseLight)
        emit = np.asarray(lt.material.emit.color, np.float32)
        assert emit.max() >= 100.0      # intensity 1000 * color

    def test_camera(self):
        sc = self.scene()
        # yfov 0.3996 rad ~= 22.9 deg
        np.testing.assert_allclose(
            float(np.rad2deg(2 * np.arctan(float(sc.camera.scale)))),
            22.895, atol=0.05)
        np.testing.assert_allclose(float(sc.camera.aspect), 16 / 9,
                                   rtol=1e-3)

    def test_material_is_lambertian(self):
        """metallicFactor 0 -> Lambertian (gltf.rs:147-168)."""
        sc = self.scene()
        tri = next(o for o in sc.world if isinstance(o, S.Triangle))
        assert isinstance(tri.material, S.Lambertian)

    def test_background(self):
        sc = self.scene()
        np.testing.assert_allclose(np.asarray(sc.background, np.float32),
                                   0.051, rtol=1e-5)

    def test_compiles(self):
        sd = compile_scene(self.scene())
        assert sd.n_tris >= 12 and sd.n_spheres >= 1 and sd.n_lights == 1


@needs_assets
def test_suzanne_counts():
    sc = load_gltf_scene(os.path.join(ASSETS, "suzanne.gltf"), 16 / 9)
    tris = [o for o in sc.world if isinstance(o, S.Triangle)]
    assert len(tris) == 968             # BASELINE.md workload size


@needs_assets
def test_metal_rough_spheres_loads():
    """External .bin buffers + u32 indices — unsupported by the reference
    importer (gltf.rs:118-130,194-197), fixed here."""
    path = os.path.join(ASSETS, "MetalRoughSpheres", "MetalRoughSpheres.gltf")
    if not os.path.exists(path):
        pytest.skip("MetalRoughSpheres not present")
    sc = load_gltf_scene(path, 1.0)
    tris = [o for o in sc.world if isinstance(o, S.Triangle)]
    assert len(tris) > 1000
    mats = {id(o.material) for o in tris}
    assert len(mats) > 50               # 98 materials in the grid
    sd = compile_scene(sc)
    assert sd.n_tris >= len(tris)


def test_data_uri_roundtrip(tmp_path):
    """Self-built minimal glTF: one triangle via base64 data URI."""
    import base64
    import json
    import struct

    verts = struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 1, 0)
    idx = struct.pack("<3H", 0, 1, 2)
    buf = verts + idx
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
            "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1}]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    sc = load_gltf_scene(str(p))
    tris = [o for o in sc.world if isinstance(o, S.Triangle)]
    assert len(tris) == 1
    # node translation applied (fixes the reference's ignored node transform)
    np.testing.assert_allclose(np.asarray(tris[0].v0, np.float32),
                               [1, 2, 3], atol=1e-6)
    # no camera in file -> Camera::default() 30 deg vfov (camera.rs:41-54)
    np.testing.assert_allclose(
        float(np.rad2deg(2 * np.arctan(float(sc.camera.scale)))), 30.0,
        atol=1e-3)


def test_names_containing_type_are_safe(tmp_path):
    """The reference corrupts any glTF whose JSON contains the substring
    "type" in names (gltf.rs:112 string-replace hack). We must not."""
    import json
    doc = {
        "asset": {"version": "2.0"},
        "nodes": [{"name": "prototype_node"}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    p = tmp_path / "named.gltf"
    p.write_text(json.dumps(doc))
    sc = load_gltf_scene(str(p))   # must not raise
    assert sc.world == []


def test_glb_binary_container(tmp_path):
    """GLB (binary glTF) round trip — an extension over the reference
    importer (JSON only)."""
    import json as _json
    import struct

    verts = struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 1, 0)
    idx = struct.pack("<3H", 0, 1, 2) + b"\x00\x00"  # pad to 4
    binc = verts + idx
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(binc)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    j = _json.dumps(doc).encode()
    j += b" " * (-len(j) % 4)
    glb = (b"glTF" + struct.pack("<II", 2, 12 + 8 + len(j) + 8 + len(binc))
           + struct.pack("<I4s", len(j), b"JSON") + j
           + struct.pack("<I4s", len(binc), b"BIN\x00") + binc)
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    sc = load_gltf_scene(str(p))
    tris = [o for o in sc.world if isinstance(o, S.Triangle)]
    assert len(tris) == 1
    np.testing.assert_allclose(np.asarray(tris[0].v0, np.float32),
                               [0, 0, 0], atol=1e-6)
