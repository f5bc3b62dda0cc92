"""Asset reader tests (reference: src/gi/impl/AssetReader.cpp)."""

from gatling_tpu.render import assets


def test_mmap_reader_roundtrip(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"hello gatling" * 100)
    data = assets.read_asset(str(p))
    assert data == b"hello gatling" * 100


def test_missing_asset_returns_none():
    assert assets.read_asset("/nonexistent/nope.bin") is None


def test_empty_file(tmp_path):
    p = tmp_path / "empty.bin"
    p.write_bytes(b"")
    assert assets.read_asset(str(p)) == b""


def test_custom_reader_registration(tmp_path):
    class DictReader(assets.GiAssetReader):
        def __init__(self, blobs):
            self.blobs = blobs

        def open(self, path):
            if path in self.blobs:
                data = self.blobs[path]
                return assets.GiAsset(data, len(data))
            return None

    assets.gi_register_asset_reader(DictReader({"virtual://x": b"XYZ"}))
    assert assets.read_asset("virtual://x") == b"XYZ"
    # chain still falls through to mmap for real files
    p = tmp_path / "real.bin"
    p.write_bytes(b"abc")
    assert assets.read_asset(str(p)) == b"abc"
