"""AVI capture (utils/video.py): container round-trip, header fields,
size/validation errors."""

import struct

import numpy as np
import pytest

from softwarerenderer_tpu.utils import video


def _frames(n=4, h=18, w=25, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_round_trip_pixels_exact(tmp_path):
    path = str(tmp_path / "clip.avi")
    frames = _frames()
    with video.AviWriter(path, fps=24.0) as wr:
        for f in frames:
            wr.add(f)
        assert wr.frames == len(frames)
    back, fps = video.read_avi(path)
    assert fps == pytest.approx(24.0, abs=1e-3)
    assert back.shape == frames.shape
    assert (back == frames).all()


def test_rgba_input_drops_alpha(tmp_path):
    path = str(tmp_path / "clip.avi")
    rgba = np.dstack([_frames(1)[0], np.full((18, 25, 1), 77, np.uint8)])
    with video.AviWriter(path) as wr:
        wr.add(rgba)
    back, _ = video.read_avi(path)
    assert (back[0] == rgba[..., :3]).all()


def test_riff_structure_and_counts(tmp_path):
    path = str(tmp_path / "clip.avi")
    with video.AviWriter(path, fps=30.0) as wr:
        for f in _frames(3):
            wr.add(f)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert riff_size == len(data) - 8           # back-patched size
    # avih dwTotalFrames and strh dwLength both say 3
    (total,) = struct.unpack_from("<I", data, 12 + 12 + 8 + 16)
    (length,) = struct.unpack_from(
        "<I", data, 12 + 12 + 8 + 56 + 12 + 8 + 32)
    assert total == 3 and length == 3
    assert b"idx1" in data


def test_mismatched_frame_size_rejected(tmp_path):
    wr = video.AviWriter(str(tmp_path / "clip.avi"))
    wr.add(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        wr.add(np.zeros((8, 9, 3), np.uint8))
    wr.close()


def test_bad_shape_rejected(tmp_path):
    wr = video.AviWriter(str(tmp_path / "clip.avi"))
    with pytest.raises(ValueError):
        wr.add(np.zeros((8, 8), np.uint8))


def test_empty_writer_close_is_noop(tmp_path):
    path = str(tmp_path / "never.avi")
    video.AviWriter(path).close()
    import os
    assert not os.path.exists(path)     # no frames → no file


def test_odd_width_row_padding(tmp_path):
    """Stride must pad to 4 bytes; 25*3=75 → 76."""
    path = str(tmp_path / "odd.avi")
    frames = _frames(2, h=7, w=25, seed=3)
    with video.AviWriter(path) as wr:
        for f in frames:
            wr.add(f)
    back, _ = video.read_avi(path)
    assert (back == frames).all()


def test_float_frames_convert_like_to_rgb8(tmp_path):
    path = str(tmp_path / "f.avi")
    rgbf = np.random.default_rng(5).uniform(0, 1, (9, 13, 3)) \
        .astype(np.float32)
    with video.AviWriter(path) as wr:
        wr.add(rgbf)
    back, _ = video.read_avi(path)
    # Writer clips+scales; round-trip must match that exact conversion.
    # (engine.to_rgb8 truncates; the writer's standalone conversion is
    # documented as clip*255 cast.)
    expect = (np.clip(rgbf, 0, 1) * 255.0).astype(np.uint8)
    assert (back[0] == expect).all()


def test_integer_non_u8_rejected(tmp_path):
    wr = video.AviWriter(str(tmp_path / "i.avi"))
    with pytest.raises(ValueError):
        wr.add(np.zeros((4, 4, 3), np.int32))


def test_riff_size_limit_guard(tmp_path):
    path = str(tmp_path / "big.avi")
    wr = video.AviWriter(path)
    wr.add(np.zeros((4, 4, 3), np.uint8))
    # Simulate a file already near 4 GiB (sparse seek; nothing written
    # there): the next add() must refuse BEFORE corrupting the stream.
    wr._f.seek(0xFFFF_FFF0)
    with pytest.raises(ValueError, match="4 GiB"):
        wr.add(np.zeros((4, 4, 3), np.uint8))
    wr._f.close()
    wr._f = None
