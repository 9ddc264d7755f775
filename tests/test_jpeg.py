"""First-party baseline JPEG decoder (data/jpeg.py) + MJPEG-in-AVI.

PIL (libjpeg) is the oracle: we decode the SAME byte streams and must land
within libjpeg's fixed-point-IDCT tolerance (+/-2) for 4:4:4 and grayscale;
4:2:0 additionally differs by chroma upsampling (libjpeg triangle vs our
nearest), bounded on smooth content.
"""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from multimodal_av_model_tpu.data.jpeg import JpegError, decode_jpeg  # noqa: E402


def _encode(img: np.ndarray, mode="RGB", **kw) -> bytes:
    buf = io.BytesIO()
    PIL.fromarray(img, mode).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _oracle(blob: bytes) -> np.ndarray:
    return np.asarray(PIL.open(io.BytesIO(blob)).convert("RGB"))


def _smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 100 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
        for i in range(3)], -1)
    img += rng.standard_normal((h, w, 3)) * 4
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [75, 95])
@pytest.mark.parametrize("size", [(8, 8), (24, 40), (33, 47)])
def test_decode_444_matches_libjpeg(quality, size):
    img = _smooth(*size, seed=quality)
    blob = _encode(img, quality=quality, subsampling=0)   # 4:4:4
    got = decode_jpeg(blob)
    want = _oracle(blob)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_decode_420_smooth_content():
    img = _smooth(64, 48, seed=3)
    blob = _encode(img, quality=90, subsampling=2)        # 4:2:0
    got = decode_jpeg(blob)
    want = _oracle(blob)
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    # Luma path is IDCT-exact; chroma differs by the upsampling filter.
    assert diff.mean() < 2.0 and np.percentile(diff, 99) <= 12


def test_decode_grayscale():
    img = _smooth(31, 29, seed=5)[:, :, 0]
    blob = _encode(img, mode="L", quality=92)
    got = decode_jpeg(blob)
    want = np.asarray(PIL.open(io.BytesIO(blob)))
    assert got.ndim == 2
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_decode_with_restart_markers():
    img = _smooth(40, 56, seed=7)
    blob = _encode(img, quality=85, subsampling=0, restart_marker_blocks=3)
    assert b"\xff\xdd" in blob                # DRI present
    got = decode_jpeg(blob)
    want = _oracle(blob)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_progressive_raises_with_feature_named():
    img = _smooth(16, 16)
    blob = _encode(img, quality=80, progressive=True)
    with pytest.raises(JpegError, match="progressive"):
        decode_jpeg(blob)


def test_not_a_jpeg():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x00" * 32)


def test_mjpeg_avi_round_trip(tmp_path):
    """MJPEG container: PIL-encoded frames -> write_avi_mjpeg -> our reader
    (container parse + first-party JPEG decode) matches the oracle."""
    from multimodal_av_model_tpu.data.avi import AviReader, write_avi_mjpeg

    T, H, W = 4, 32, 24
    frames = [_smooth(H, W, seed=t) for t in range(T)]
    blobs = [_encode(f, quality=92, subsampling=0) for f in frames]
    path = str(tmp_path / "clip.avi")
    write_avi_mjpeg(path, blobs, W, H, fps=30)

    with AviReader(path) as r:
        assert r.num_frames == T and (r.width, r.height) == (W, H)
        assert r.fps == 30.0
        for t in range(T):
            got = r.read_frame(t)
            want = _oracle(blobs[t])
            # libjpeg's fixed-point IDCT and fixed-point YCbCr->RGB each
            # round; their composition lands within +/-3 of our float path.
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 3
