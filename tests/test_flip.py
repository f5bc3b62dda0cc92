"""LDR-FLIP metric sanity (gatling_tpu/flip.py, Andersson et al. 2020).

Properties any correct FLIP implementation must have: zero on identical
images, bounded to [0,1], monotone in perturbation size, more sensitive to
structured (edge) error than to the same energy spread as broad noise, and
symmetric-ish under small perturbations.
"""

import numpy as np

from gatling_tpu.flip import flip, mean_flip


def _base(h=64, w=64):
    rng = np.random.default_rng(5)
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = (0.25, 0.45, 0.30)
    img[:, w // 2:] = (0.60, 0.40, 0.35)
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def test_identical_is_zero():
    img = _base()
    assert mean_flip(img, img) == 0.0


def test_bounds_and_monotonicity():
    img = _base()
    scores = []
    for eps in (0.02, 0.08, 0.25):
        pert = np.clip(img + eps, 0, 1)
        m = flip(img, pert)
        assert (m >= 0).all() and (m <= 1).all()
        scores.append(m.mean())
    assert scores[0] < scores[1] < scores[2]
    # gross difference approaches 1
    assert mean_flip(np.zeros((32, 32, 3)), np.ones((32, 32, 3))) > 0.8


def test_error_is_local_and_peaks_at_structure():
    """FLIP is a per-pixel metric: an inserted white bar scores high AT the
    bar and near zero far from it (the CSF/feature filters have bounded
    support)."""
    img = _base()
    edge = img.copy()
    edge[:, 30:34] = (1.0, 1.0, 1.0)  # hard white bar
    m = flip(img, edge)
    assert m[:, 30:34].mean() > 0.5          # strong error at the bar
    assert m[:, :16].max() < 0.05            # clean far away
    assert m[:, 52:].max() < 0.05


def test_uint8_inputs():
    img8 = (np.clip(_base(), 0, 1) * 255).astype(np.uint8)
    assert mean_flip(img8, img8) == 0.0
    pert = img8.copy()
    pert[10:20, 10:20] = 255
    assert 0.0 < mean_flip(img8, pert) < 1.0


def test_graphical_harness_flip_gate(tmp_path, monkeypatch):
    """gtl:flipThreshold gates run_graphical_test on the mean FLIP score
    (renders are stubbed; only the gating logic is under test)."""
    import gatling_tpu.testing as testing
    from gatling_tpu import imgio

    rgb = (np.clip(_base(), 0, 1) * 255).astype(np.uint8)
    ref = np.concatenate([rgb, np.full(rgb.shape[:2] + (1,), 255, np.uint8)],
                         axis=-1)
    bad = ref.copy()
    bad[20:44, 20:44, :3] = 255

    scene = tmp_path / "scene.usda"
    scene.write_text("#usda 1.0\n")
    imgio.write_image_file(tmp_path / "ref_p.png", ref)

    class Spec:
        settings = {"errorPixelThreshold": 10**9, "flipThreshold": 0.02}

    monkeypatch.setattr(testing, "render_products",
                        lambda p: ({"p": bad}, Spec()))
    failures = testing.run_graphical_test(scene, tmp_path / "out")
    assert failures and "FLIP" in failures[0]

    monkeypatch.setattr(testing, "render_products",
                        lambda p: ({"p": ref}, Spec()))
    assert testing.run_graphical_test(scene, tmp_path / "out") == []
