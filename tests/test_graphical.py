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
