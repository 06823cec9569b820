"""Minimal libmp3lame ctypes encoder: conformance-vector generation for
the from-scratch Layer III decoder (tests/test_mp3_native.py). Test-only —
the production decode path never touches lame."""
import pytest
import ctypes
import numpy as np

try:
    _lame = ctypes.CDLL("libmp3lame.so.0")
except OSError:  # pragma: no cover
    pytest.skip("libmp3lame not available", allow_module_level=True)
_lame.lame_init.restype = ctypes.c_void_p
for f, a in [("lame_set_in_samplerate", ctypes.c_int),
             ("lame_set_out_samplerate", ctypes.c_int),
             ("lame_set_num_channels", ctypes.c_int),
             ("lame_set_brate", ctypes.c_int),
             ("lame_set_mode", ctypes.c_int),
             ("lame_set_quality", ctypes.c_int),
             ("lame_set_VBR", ctypes.c_int),
             ("lame_set_bWriteVbrTag", ctypes.c_int)]:
    getattr(_lame, f).argtypes = [ctypes.c_void_p, a]
_lame.lame_init_params.argtypes = [ctypes.c_void_p]
_lame.lame_encode_buffer_ieee_float.restype = ctypes.c_int
_lame.lame_encode_buffer_ieee_float.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ctypes.c_char_p, ctypes.c_int]
_lame.lame_encode_flush.restype = ctypes.c_int
_lame.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int]
_lame.lame_close.argtypes = [ctypes.c_void_p]

def encode(pcm, rate, bitrate=128, stereo=None, mode=None, vbr=False,
           vbr_tag=False):
    """pcm [n] or [n,2] float32 -> mp3 bytes. ``vbr_tag=True`` keeps
    lame's Xing/Info header frame (the default for real-world encodes;
    decoders must SKIP it, tests/test_mp3_native.py)."""
    pcm = np.asarray(pcm, np.float32)
    ch = 2 if pcm.ndim == 2 else 1
    h = _lame.lame_init()
    _lame.lame_set_in_samplerate(h, rate)
    _lame.lame_set_out_samplerate(h, rate)
    _lame.lame_set_num_channels(h, ch)
    _lame.lame_set_brate(h, bitrate)
    if mode is not None:
        _lame.lame_set_mode(h, mode)  # 0 stereo, 1 js, 3 mono
    _lame.lame_set_quality(h, 2)
    _lame.lame_set_VBR(h, 4 if vbr else 0)
    _lame.lame_set_bWriteVbrTag(h, 1 if vbr_tag else 0)
    assert _lame.lame_init_params(h) >= 0
    left = np.ascontiguousarray(pcm if ch == 1 else pcm[:, 0])
    right = np.ascontiguousarray(left if ch == 1 else pcm[:, 1])
    buf = ctypes.create_string_buffer(len(left) * 2 + 65536)
    n = _lame.lame_encode_buffer_ieee_float(
        h, left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(left), buf, len(buf))
    assert n >= 0, n
    out = buf.raw[:n]
    n2 = _lame.lame_encode_flush(h, buf, len(buf))
    out += buf.raw[:n2]
    _lame.lame_close(h)
    return out
