"""Native C++ parser vs pure-Python parser: exact output parity + speed."""

import time
import zipfile

import numpy as np
import pytest

from wordgesture_gan_tpu.data.native import native_parser_available, parse_log_file_native
from wordgesture_gan_tpu.data.parse import parse_log_file

pytestmark = pytest.mark.skipif(
    not native_parser_available(), reason="native parser unavailable (no g++?)"
)


def _content_from_zip(path, idx=0):
    with zipfile.ZipFile(path) as zf:
        return zf.read(zf.namelist()[idx]).decode()


def _assert_same(py_out, c_out):
    assert set(py_out) == set(c_out)
    for word in py_out:
        assert len(py_out[word]) == len(c_out[word]), word
        for a, b in zip(py_out[word], c_out[word]):
            np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
            assert a.keyb_width == b.keyb_width
            assert a.keyb_height == b.keyb_height


def test_native_matches_python_on_synthetic(synthetic_zip):
    for idx in range(3):
        content = _content_from_zip(synthetic_zip, idx)
        _assert_same(parse_log_file(content), parse_log_file_native(content))


def test_native_matches_python_on_malformed_input():
    content = "\n".join([
        "header row",
        # valid gesture
        "s0 1000 1080 360 touchstart 10.0 20.0 1 1 0 hello 0",
        "s0 1010 1080 360 touchmove 11.0 21.0 1 1 0 hello 0",
        "s0 1020 1080 360 touchend 12.0 22.0 1 1 0 hello 0",
        # error-flagged row interrupts
        "s0 1030 1080 360 touchstart 10.0 20.0 1 1 0 world 1",
        # single-letter word skipped
        "s0 1040 1080 360 touchstart 10.0 20.0 1 1 0 a 0",
        # malformed x
        "s0 1050 1080 360 touchstart abc 20.0 1 1 0 water 0",
        # non-integer timestamp
        "s0 10.5 1080 360 touchstart 10.0 20.0 1 1 0 water 0",
        # too few columns
        "s0 1060 1080 360 touchstart 10.0 20.0 water 0",
        # gesture with only 2 points is dropped
        "s0 1070 1080 360 touchstart 10.0 20.0 1 1 0 thing 0",
        "s0 1080 1080 360 touchend 11.0 21.0 1 1 0 thing 0",
        # malformed keyboard width on touchmove drops only the line
        "s0 1090 1080 360 touchstart 1.0 2.0 1 1 0 sound 0",
        "s0 1100 xx 360 touchmove 2.0 3.0 1 1 0 sound 0",
        "s0 1110 1080 360 touchmove 3.0 4.0 1 1 0 sound 0",
        "s0 1120 1080 360 touchend 4.0 5.0 1 1 0 sound 0",
        # uppercase word lowercased
        "s0 1130 1080 360 touchstart 1.0 2.0 1 1 0 HELLO 0",
        "s0 1140 1080 360 touchmove 2.0 3.0 1 1 0 HELLO 0",
        "s0 1150 1080 360 touchend 3.0 4.0 1 1 0 HELLO 0",
        # single MULTIBYTE character: len('é')==1 in Python (code points),
        # 2 in bytes — both parsers must drop it
        "s0 1160 1080 360 touchstart 1.0 2.0 1 1 0 é 0",
        "s0 1170 1080 360 touchmove 2.0 3.0 1 1 0 é 0",
        "s0 1180 1080 360 touchend 3.0 4.0 1 1 0 é 0",
    ])
    py = parse_log_file(content)
    cc = parse_log_file_native(content)
    _assert_same(py, cc)
    assert "hello" in py and len(py["hello"]) == 2
    assert "thing" not in py
    assert "é" not in py and "é" not in cc
    assert len(py["sound"][0].points) == 3   # malformed touchmove dropped


def test_native_parser_faster(synthetic_zip):
    content = _content_from_zip(synthetic_zip) * 20
    t0 = time.perf_counter()
    parse_log_file(content)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    parse_log_file_native(content)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py


def test_hex_float_rejected_like_python():
    content = "\n".join([
        "header",
        # hex-looking x coordinate: Python float() rejects -> line skipped
        "s0 1000 1080 360 touchstart 0x10 20.0 1 1 0 hello 0",
        "s0 1010 1080 360 touchstart 10.0 20.0 1 1 0 hello 0",
        "s0 1020 1080 360 touchmove 11.0 21.0 1 1 0 hello 0",
        "s0 1030 1080 360 touchend 12.0 22.0 1 1 0 hello 0",
    ])
    py = parse_log_file(content)
    cc = parse_log_file_native(content)
    _assert_same(py, cc)
    assert len(py["hello"]) == 1 and len(py["hello"][0].points) == 3
