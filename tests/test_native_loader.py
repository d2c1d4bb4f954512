"""Native C++ batch image decoder tests (built on demand; skipped without a
toolchain)."""

import numpy as np
import pytest

from chronoedit_tpu.data.native_loader import (
    build_native, decode_image_batch, native_available,
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    paths = []
    # smooth gradient images: accuracy-comparable across resize kernels
    g = np.linspace(0, 255, 320, dtype=np.uint8)
    for i in range(4):
        arr = np.stack([np.roll(np.tile(g, (241, 1)), i * 30, axis=1)] * 3, -1)
        p = str(root / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def native():
    if not native_available() and not build_native():
        pytest.skip("native loader not buildable in this environment")


def test_native_matches_pil(native, jpegs):
    a = decode_image_batch(jpegs, 128, 160, force_backend="native")
    b = decode_image_batch(jpegs, 128, 160, force_backend="pil")
    assert a.shape == b.shape == (4, 3, 128, 160)
    assert float(np.abs(a - b).mean()) < 0.02
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_native_bad_file_zero_filled(native, jpegs):
    out = decode_image_batch(["/nonexistent/x.jpg", jpegs[0]], 64, 64,
                             force_backend="native")
    assert float(np.abs(out[0]).max()) == 0.0
    assert float(np.abs(out[1]).max()) > 0.0


def test_auto_backend_falls_back_for_png(tmp_path, jpegs):
    from PIL import Image

    p = str(tmp_path / "x.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(p)
    out = decode_image_batch([p], 16, 16)  # png -> PIL path regardless
    assert out.shape == (1, 3, 16, 16)
