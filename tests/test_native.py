"""C++ arena codec: build, roundtrip, integrity sweep, store integration."""

import zlib

import numpy as np
import pytest

from fhe_icp_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

RNG = np.random.default_rng(41)


def test_crc32c_known_vector():
    # RFC 3720 test vector: CRC-32C of "123456789" is 0xE3069283.
    assert native.crc32c(b"123456789") == 0xE3069283


def test_arena_roundtrip(tmp_path):
    docs = RNG.integers(0, 2 ** 31, size=(7, 4, 2, 64),
                        dtype=np.int64).astype(np.uint32)
    path = tmp_path / "a.arena"
    native.arena_write(path, docs)
    count, wpd = native.arena_info(path)
    assert (count, wpd) == (7, 4 * 2 * 64)
    view = native.arena_mmap(path, (4, 2, 64))
    assert (np.asarray(view) == docs).all()
    valid, bad = native.arena_validate(path)
    assert (valid, bad) == (7, None)


def test_arena_detects_corruption(tmp_path):
    docs = RNG.integers(0, 2 ** 31, size=(5, 128),
                        dtype=np.int64).astype(np.uint32)
    path = tmp_path / "a.arena"
    native.arena_write(path, docs)
    raw = bytearray(path.read_bytes())
    # Flip one byte inside document 2's payload.
    raw[64 + (2 * 128 + 5) * 4] ^= 0xFF
    path.write_bytes(bytes(raw))
    valid, bad = native.arena_validate(path)
    assert valid == 4 and bad == 2
    # Header corruption -> hard error.
    raw[3] ^= 0xFF
    path.write_bytes(bytes(raw))
    with pytest.raises(OSError):
        native.arena_info(path)


def test_arena_rejects_wrong_shape(tmp_path):
    docs = RNG.integers(0, 100, size=(3, 32), dtype=np.int64).astype(np.uint32)
    path = tmp_path / "a.arena"
    native.arena_write(path, docs)
    with pytest.raises(ValueError, match="words"):
        native.arena_mmap(path, (33,))


def test_store_export_load_arena(tmp_path):
    from tests.test_pipeline import make_doc
    from fhe_icp_tpu.store import EncryptedDocumentStore
    store = EncryptedDocumentStore(str(tmp_path / "docs"))
    for d in ("a", "b", "c"):
        store.save(make_doc(d))
    ids, path = store.export_arena()
    assert ids == ["a", "b", "c"]
    ids2, view = store.load_arena()
    assert ids2 == ids
    assert view.shape[0] == 3
    assert (np.asarray(view[1]) == store.load("b").ct_data).all()
