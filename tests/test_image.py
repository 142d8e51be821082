import numpy as np

from xr.core import image


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    image.write_png(p, img)
    back = image.read_png(p)
    assert (back == img).all()


def test_png_gray(tmp_path):
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4).astype(np.uint8)
    p = str(tmp_path / "g.png")
    image.write_png(p, img)
    back = image.read_png(p)
    assert back.shape == (8, 8, 3)
    assert (back[:, :, 0] == img).all()
