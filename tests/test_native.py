"""Native C++ PNG decoder + prefetching frame loader vs PIL oracle."""

import io
import os
import time

import numpy as np
import pytest

from jetracer_orbslam2_tpu.io import native_loader


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_loader.available():
        assert native_loader.build(), "native build failed (g++/zlib?)"
    assert native_loader.available()


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    if arr.dtype == np.uint16:
        Image.fromarray(arr, mode="I;16").save(buf, format="PNG")
    else:
        Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.parametrize("shape,dtype", [
    ((37, 53), np.uint8),          # gray 8  (odd sizes exercise filters)
    ((64, 64), np.uint16),         # gray 16 (TUM depth)
    ((40, 60, 3), np.uint8),       # RGB
    ((24, 31, 4), np.uint8),       # RGBA
])
def test_decode_matches_pil(shape, dtype):
    rng = np.random.default_rng(hash(str(shape)) % 2**31)
    hi = 65535 if dtype == np.uint16 else 255
    # structured content exercises all PNG row filters
    base = rng.integers(0, hi, shape).astype(dtype)
    yy = np.arange(shape[0])[:, None] * (hi // max(shape[0], 1))
    grad = (yy + np.arange(shape[1])[None, :]).astype(dtype)
    if len(shape) == 3:
        grad = grad[..., None]
    arr = ((base.astype(np.int64) + grad) % (hi + 1)).astype(dtype)
    out = native_loader.decode_png(_png_bytes(arr))
    np.testing.assert_array_equal(out, arr)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native_loader.decode_png(b"not a png at all")


def test_frame_loader_in_order(tmp_path):
    from PIL import Image

    n = 40
    rng = np.random.default_rng(0)
    paths = []
    imgs = []
    for i in range(n):
        arr = rng.integers(0, 255, (32, 48), dtype=np.uint8)
        p = str(tmp_path / f"f{i:03d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        imgs.append(arr)
    ld = native_loader.NativeFrameLoader(paths, threads=4, capacity=6)
    got = list(ld)
    ld.close()
    assert [i for i, _ in got] == list(range(n))
    for i, arr in got:
        np.testing.assert_array_equal(arr, imgs[i])


def test_frame_loader_skips_bad_file(tmp_path):
    from PIL import Image

    paths = []
    for i in range(3):
        p = str(tmp_path / f"g{i}.png")
        Image.fromarray(np.full((8, 8), i, np.uint8)).save(p)
        paths.append(p)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    paths.insert(1, bad)
    missing = str(tmp_path / "missing.png")
    paths.insert(3, missing)
    ld = native_loader.NativeFrameLoader(paths, threads=2, capacity=4)
    got = list(ld)
    ld.close()
    assert ld.num_errors == 2
    assert [int(a[0, 0]) for _, a in got] == [0, 1, 2]


def test_datasets_use_native_decoder(tmp_path):
    """io.datasets must produce identical frames with and without the
    native decoder."""
    from PIL import Image

    from jetracer_orbslam2_tpu.io import datasets

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    dep = rng.integers(0, 20000, (24, 32)).astype(np.uint16)
    rgb_p = str(tmp_path / "rgb.png")
    dep_p = str(tmp_path / "dep.png")
    Image.fromarray(rgb).save(rgb_p)
    Image.fromarray(dep, mode="I;16").save(dep_p)

    g_native = datasets._imread_rgb_as_gray(rgb_p)
    d_native = datasets._imread_depth16(dep_p, 1 / 5000.0)
    assert native_loader.available()
    # force PIL fallback
    native_loader._lib, native_loader._lib_tried = None, True
    try:
        g_pil = datasets._imread_rgb_as_gray(rgb_p)
        d_pil = datasets._imread_depth16(dep_p, 1 / 5000.0)
    finally:
        native_loader._lib_tried = False
    np.testing.assert_allclose(g_native, g_pil, atol=1e-4)
    np.testing.assert_allclose(d_native, d_pil, atol=1e-9)
