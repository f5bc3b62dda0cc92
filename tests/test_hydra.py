"""Render-delegate layer tests (hdGatling analog)."""

import numpy as np

from gatling_tpu.hydra import get_renderer_plugin
from gatling_tpu.hydra.delegate import HdAovBinding
from gatling_tpu.scene.stage import load_scene

CORNELL = "/root/reference/cornell.usda"


def test_plugin_and_delegate_capabilities():
    plugin = get_renderer_plugin()
    assert plugin.is_supported()
    delegate = plugin.create_render_delegate()
    assert "Mesh" in delegate.supported_rprim_types()
    assert "DomeLight" in delegate.supported_sprim_types()
    assert "RenderBuffer" in delegate.supported_bprim_types()
    names = [d.name for d in delegate.render_setting_descriptors()]
    assert "spp" in names and "maxBounces" in names


def test_delegate_render_pass_cornell():
    plugin = get_renderer_plugin()
    delegate = plugin.create_render_delegate()
    desc = load_scene(CORNELL)
    for m in desc.meshes:
        delegate.sync_mesh(m)
    for mat in desc.materials.values():
        delegate.sync_material(mat)
    delegate.set_render_setting("spp", 2)
    delegate.set_render_setting("maxBounces", 3)

    buf = delegate.create_render_buffer(48, 48, "Float32Vec4")
    rp = delegate.create_render_pass()
    rp.execute(desc.first_camera(), [HdAovBinding("color", buf)])
    img = buf.map()
    assert img.shape == (48, 48, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.1
    assert buf.converged


def test_interactive_accumulates():
    plugin = get_renderer_plugin()
    delegate = plugin.create_render_delegate()
    desc = load_scene(CORNELL)
    for m in desc.meshes:
        delegate.sync_mesh(m)
    for mat in desc.materials.values():
        delegate.sync_material(mat)
    delegate.set_render_setting("spp", 1)
    delegate.set_render_setting("maxBounces", 2)
    buf = delegate.create_render_buffer(32, 32)
    rp = delegate.create_render_pass()
    rp.execute(desc.first_camera(), [HdAovBinding("color", buf)], interactive=True)
    assert not buf.converged
    assert delegate.scene.sample_offset == 1
    rp.execute(desc.first_camera(), [HdAovBinding("color", buf)], interactive=True)
    assert delegate.scene.sample_offset == 2  # progressive accumulation


def test_renderer_commands_and_debug_lock(monkeypatch, capsys):
    """renderDelegate.cpp:145-195 analogs: the printLicenses renderer
    command, and debug-only settings locked outside debug sessions."""
    monkeypatch.delenv("GATLING_DEBUG", raising=False)
    plugin = get_renderer_plugin()
    dl = plugin.create_render_delegate()
    names = [d["commandName"] for d in dl.get_renderer_command_descriptors()]
    assert "printLicenses" in names
    assert dl.invoke_renderer_command("printLicenses")
    assert "Apache License" in capsys.readouterr().out
    assert not dl.invoke_renderer_command("definitelyNotACommand")
    before = dl.render_settings["progressiveAccumulation"]
    dl.set_render_setting("progressiveAccumulation", not before)
    assert dl.render_settings["progressiveAccumulation"] == before
    monkeypatch.setenv("GATLING_DEBUG", "1")
    dl.set_render_setting("progressiveAccumulation", not before)
    assert dl.render_settings["progressiveAccumulation"] != before


def test_material_dump_hook(monkeypatch, tmp_path):
    """GATLING_DUMP_MATERIALS: the GTL_DUMP_MTLX/MDL observability analog
    writes one JSON per lowered material."""
    import json

    from gatling_tpu.render.material import lower_material

    monkeypatch.setenv("GATLING_DUMP_MATERIALS", str(tmp_path))
    desc = load_scene(CORNELL)
    for m in desc.materials.values():
        lower_material(m)
    files = list(tmp_path.glob("*.json"))
    assert len(files) == len(desc.materials)
    doc = json.loads(files[0].read_text())
    assert {"params", "traits", "textures", "dynamic"} <= set(doc)
