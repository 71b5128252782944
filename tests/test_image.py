"""PPM writer/reader round-trip + reference quantization semantics."""

import numpy as np

from skele_raytracer_tpu.utils.image import quantize, read_ppm, write_ppm


def test_quantize_reference_semantics():
    img = np.asarray([[[0.0, 0.5, 1.0], [1.5, 0.999, 0.001]]])
    q = quantize(img)
    # min(1, v) * 255 truncated to uchar (src/main.cpp:96)
    assert q.tolist() == [[[0, 127, 255], [255, 254, 0]]]


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((7, 5, 3)).astype(np.float32)
    path = str(tmp_path / "x.ppm")
    write_ppm(path, img)
    back = read_ppm(path)
    np.testing.assert_array_equal(back, quantize(img))


def test_read_reference_golden_header():
    # The one surviving machine-readable reference render: 640x480 P6
    # (SURVEY.md §4; /root/reference/renders/testcpu.ppm).
    img = read_ppm("/root/reference/renders/testcpu.ppm")
    assert img.shape == (480, 640, 3)
