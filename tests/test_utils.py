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
