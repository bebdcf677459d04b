"""Native C++ loader: parity vs the cv2 host letterbox path + robustness."""

import os

import numpy as np
import pytest

from litepi_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason=f"native loader unavailable: {native_loader.build_error()}",
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(681, 1198), (480, 640), (2048, 2048)]):
        # smooth images: JPEG is lossy, so parity tests need low-frequency data
        base = rng.integers(60, 200, (8, 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        p = str(root / f"im{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_matches_cv2_letterbox(jpegs):
    import cv2

    from litepi_tpu.ops.letterbox import letterbox_host, letterbox_params

    loader = native_loader.NativeBatchLoader(threads=4, out_size=640)
    canvases, geoms = loader.load(jpegs)
    assert canvases.shape == (3, 640, 640, 3)

    for i, p in enumerate(jpegs):
        ref_img = cv2.imread(p)  # BGR
        ref_canvas, r, (dw, dh) = letterbox_host(ref_img, 640)
        np.testing.assert_allclose(
            geoms[i], [r, dw, dh, ref_img.shape[1], ref_img.shape[0]],
            rtol=1e-5,
        )
        diff = np.abs(
            canvases[i].astype(np.int16) - ref_canvas.astype(np.int16)
        )
        # decode (libjpeg DCT variants) + resize rounding both contribute;
        # on smooth data the paths agree to ~1 LSB on average
        assert diff.mean() < 2.0, diff.mean()
    loader.close()


def test_missing_file_yields_padded_canvas(jpegs, tmp_path):
    loader = native_loader.NativeBatchLoader(threads=2, out_size=320)
    canvases, geoms = loader.load([jpegs[0], str(tmp_path / "missing.jpg")])
    assert geoms[1, 0] == 0.0  # failure marker
    assert (canvases[1] == 114).all()
    assert geoms[0, 0] > 0.0
    loader.close()


def test_corrupt_file_survives(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 this is not a real jpeg")
    loader = native_loader.NativeBatchLoader(threads=2, out_size=160)
    canvases, geoms = loader.load([str(bad)])
    assert geoms[0, 0] == 0.0
    assert (canvases[0] == 114).all()
    loader.close()


def test_large_batch_threaded(jpegs):
    loader = native_loader.NativeBatchLoader(threads=8, out_size=640)
    paths = jpegs * 11  # 33 images across 8 workers
    canvases, geoms = loader.load(paths)
    assert canvases.shape[0] == 33
    assert (geoms[:, 0] > 0).all()
    # identical inputs -> identical outputs regardless of worker assignment
    np.testing.assert_array_equal(canvases[0], canvases[3])
    loader.close()
