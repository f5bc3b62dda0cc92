"""Graphical regression tests.

The pytest face of gatling_tpu.testing: every scene under tests/graphical/
carries a UsdRenderSettings prim driving resolution/camera/AOVs plus
namespaced gtl: settings; renders are byte-diffed against committed
reference PNGs with per-scene error-pixel thresholds
(reference strategy: src/hdGatling/main.cpp:332-376 + SURVEY.md §4).

Regenerate references after intentional changes:
    GATLING_GEN_REFS=1 python -m pytest tests/test_graphical.py
"""

import os
from pathlib import Path

import pytest

from gatling_tpu.testing import generate_references, run_graphical_test

GRAPHICAL_DIR = Path(__file__).parent / "graphical"
SCENES = sorted(p.parent for p in GRAPHICAL_DIR.glob("*/scene.usda"))


@pytest.mark.parametrize("scene_dir", SCENES, ids=lambda p: p.name)
def test_graphical(scene_dir, tmp_path, fail_on_error_log):
    scene = scene_dir / "scene.usda"
    if os.environ.get("GATLING_GEN_REFS") == "1":
        generate_references(scene)
        return
    failures = run_graphical_test(scene, tmp_path)
    assert not failures, "\n".join(failures) + f"\n(artifacts in {tmp_path})"


def test_colorspace_roundtrip_analytic(fail_on_error_log):
    """Non-circular check on the ColorSpaces scene: the sRGB-tagged band's
    output bytes must reproduce the source texture bytes (sRGB decode at
    load then sRGB encode at write cancel exactly), while the raw band
    re-encodes the linear gradient (strictly brighter in the interior).
    Reference plumbing: UsdUVTexture sourceColorSpace inference,
    MtlxDocumentPatcher.cpp:201+."""
    import numpy as np
    from PIL import Image

    from gatling_tpu.testing import render_products

    scene = GRAPHICAL_DIR / "MaterialX.ColorSpaces" / "scene.usda"
    images, _spec = render_products(scene)
    color = images["color"]  # [H, W, 3] u8, sRGB-encoded, NOT flipped
    src = np.asarray(Image.open(GRAPHICAL_DIR / "MaterialX.ColorSpaces"
                                / "gradient.png"))[0, :, 0]  # [64] u8

    h, w = color.shape[:2]
    # band rows (render_products rows run top-down): raw band is the top
    # third, srgb the middle, auto the bottom — sample each band's center
    raw_row = color[int(h * 0.17), :, 0].astype(np.float64)
    srgb_row = color[h // 2, :, 0].astype(np.float64)
    auto_row = color[int(h * 0.83), :, 0].astype(np.float64)

    # resample source gradient to the band's on-screen width: the frustum
    # half-width at the quad plane (distance 6, 35mm/20.955 aperture) is
    # 6 * 10.4775/35 = 1.7961; the quad spans x in [-2.1, 2.1]
    xs = (np.arange(w) + 0.5) / w  # screen u
    quad_u = (xs - 0.5) * (2 * 6 * 10.4775 / 35) / 4.2 + 0.5
    inside = (quad_u > 0.02) & (quad_u < 0.98)
    src_at = np.interp(quad_u, (np.arange(64) + 0.5) / 64, src.astype(np.float64))

    # sRGB band: decode+encode cancel -> output ~= source bytes
    assert np.abs(srgb_row[inside] - src_at[inside]).max() <= 6.0
    # auto on a color input infers sRGB -> identical to the sRGB band
    assert np.abs(auto_row[inside] - srgb_row[inside]).max() <= 2.0
    # raw band: sRGB-encodes the linear gradient -> brighter in the interior
    mid = inside & (src_at > 25) & (src_at < 230)
    assert (raw_row[mid] > src_at[mid] + 10).all()
