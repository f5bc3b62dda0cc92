import os

from gatling_tpu.utils.handles import HandleStore, LinearDataStore
from gatling_tpu.utils.config import default_settings, descriptor

import pytest


def test_handle_allocate_free_reuse():
    hs = HandleStore()
    h1 = hs.allocate()
    h2 = hs.allocate()
    assert h1 != h2
    assert hs.is_valid(h1) and hs.is_valid(h2)
    hs.free(h1)
    assert not hs.is_valid(h1)
    h3 = hs.allocate()  # reuses slot of h1 with bumped version
    assert hs.is_valid(h3)
    assert h3 != h1
    assert (h3 & 0xFFFFFFFF) == (h1 & 0xFFFFFFFF)
    assert not hs.is_valid(h1)  # stale handle stays invalid


def test_handle_double_free_raises():
    hs = HandleStore()
    h = hs.allocate()
    hs.free(h)
    with pytest.raises(KeyError):
        hs.free(h)


def test_linear_data_store():
    store = LinearDataStore()
    a = store.allocate({"x": 1})
    b = store.allocate({"x": 2})
    assert store.get(a)["x"] == 1
    assert store.get(b)["x"] == 2
    store.free(a)
    with pytest.raises(KeyError):
        store.get(a)
    assert len(store) == 1


def test_settings_defaults_match_reference():
    # Defaults from renderDelegate.cpp:93-110.
    s = default_settings()
    assert s["spp"] == 1
    assert s["maxBounces"] == 13
    assert s["rrBounceOffset"] == 3
    assert s["rrInvMinTermProb"] == 0.95
    assert s["maxSampleValue"] == 10.0
    assert s["filterImportanceSampling"] is True
    assert s["nextEventEstimation"] is False
    assert s["depthOfField"] is False
    assert s["maxVolumeWalkLength"] == 7
    assert descriptor("progressiveAccumulation").debug_only


def test_gi_scene_mesh_handles():
    """GiScene mesh registration rides the gb HandleStore: stable object ids
    across removals, stale-handle detection on double-remove."""
    import numpy as np
    import pytest

    from gatling_tpu.gi import create_scene
    from gatling_tpu.scene.meshproc import build_triangulated_mesh
    from gatling_tpu.scene.stage import MeshDesc

    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tri = build_triangulated_mesh(pts, np.array([3]), np.array([0, 1, 2]))

    def mk():
        return MeshDesc(path="/m", mesh=tri, transform=np.eye(4),
                        material=None, double_sided=False, object_id=-1)

    scene = create_scene()
    a, b, c = scene.add_mesh(mk()), scene.add_mesh(mk()), scene.add_mesh(mk())
    assert (a.object_id, b.object_id, c.object_id) == (0, 1, 2)

    scene.remove_mesh(b)
    # survivors keep their ids; the freed slot is reused by the next mesh
    assert (a.object_id, c.object_id) == (0, 2)
    d = scene.add_mesh(mk())
    assert d.object_id == 1

    with pytest.raises(KeyError):
        scene.remove_mesh(b)  # stale handle


def test_watched_material_sources(tmp_path):
    """Hot-reload watch set covers scene + texture + mdl sources (the efsw
    shader-watcher analog, Gi.cpp:261-285)."""
    from gatling_tpu.cli import watched_material_sources
    from gatling_tpu.scene.stage import MaterialDesc, ShaderNode

    scene_file = tmp_path / "s.usda"
    scene_file.write_text("#usda 1.0\n")
    tex = tmp_path / "t.png"
    tex.write_bytes(b"x")
    mdl = tmp_path / "m.mdl"
    mdl.write_text("mdl 1.7;")

    node = ShaderNode(path="/m/tex", shader_id="UsdUVTexture",
                      inputs={"file": "t.png"}, input_connections={})
    mats = {
        "/m": MaterialDesc(path="/m", surface_node="/m/s",
                           nodes={node.path: node}, base_dir=str(tmp_path)),
        "/m2": MaterialDesc(path="/m2", surface_node=None, nodes={},
                            mdl_source=str(mdl)),
    }

    class FakeScene:
        materials = mats

    watched = watched_material_sources(FakeScene(), str(scene_file))
    assert set(watched) == {str(scene_file), str(tex), str(mdl)}

    # touching a material source changes the snapshot -> triggers re-render
    import os
    os.utime(tex, (1, 1))
    assert watched_material_sources(FakeScene(), str(scene_file)) != watched


def test_watched_shader_sources(monkeypatch):
    """The shader-code watch set covers the render/ and ops/ modules (the
    efsw src/gi/shaders watcher analog, Gi.cpp:261-285) and is disabled by
    GATLING_WATCH_SHADERS=0."""
    from gatling_tpu.cli import watched_shader_sources

    monkeypatch.delenv("GATLING_WATCH_SHADERS", raising=False)
    watched = watched_shader_sources()
    names = {os.path.basename(p) for p in watched}
    assert "integrator.py" in names and "pallas_bounce.py" in names
    assert all(isinstance(t, float) for t in watched.values())

    monkeypatch.setenv("GATLING_WATCH_SHADERS", "0")
    assert watched_shader_sources() == {}


def test_validation_layer(monkeypatch):
    """GATLING_VALIDATE=1 (SURVEY §5: the VK validation-layer/debugPrintf
    analog): kernels run in interpret mode, NaN tracing arms, and AOVs
    are asserted finite before the host copy."""
    import numpy as np

    monkeypatch.setenv("GATLING_VALIDATE", "1")
    monkeypatch.setenv("GATLING_FUSED", "0")
    from gatling_tpu.cli import render_scene_file
    from gatling_tpu.utils.config import default_settings

    s = default_settings()
    s.update(spp=1, maxBounces=2)
    img, _ = render_scene_file("/root/reference/cornell.usda", 16, 16, s)
    assert np.isfinite(img).all()
