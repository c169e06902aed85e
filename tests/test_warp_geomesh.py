"""WarpLib GeoMesh parity: bit-exact pins vs the compiled reference.

Goldens in tests/golden/warp/ were produced by tools/gen_warp_goldens.py
calling geomesh_* in .refbuild/libgeomesh.so (built unmodified from
/root/reference/WarpLib) through the decoder's WarpFrame call sequence
(Codec/decoder.c:9133-9420): init -> transforms ->
cache_init_bilinear_range(0, h) -> apply_bilinear.

mesh_* goldens are the raw float32 mesh node arrays (x then y) —
compared BIT-exactly.  apply_* goldens are warped frames of
deterministic test content — compared BYTE-exactly, including the
backgroundfill rand() border draws (glibc stream, seed 1, consumed in
the golden generator's fixed case order).
"""

import os

import numpy as np
import pytest

from cineform_tpu.ref import geomesh as gmref

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden", "warp")

L = gmref  # lens ids

# mirror of tools/gen_warp_goldens.py CASES
CASES = {
    "identity": ((320, 240), 39, 29, []),
    "scale": ((320, 240), 39, 29, [("scale", (1.25, 0.8))]),
    "pan": ((320, 240), 39, 29, [("pan", (10.5, -6.25))]),
    "rotate": ((320, 240), 39, 29, [("rotate", (15.0,))]),
    "fisheye_neg": ((320, 240), 39, 29, [("fisheye", (-45.0,))]),
    "fisheye_pos": ((320, 240), 39, 29, [("fisheye", (30.0,))]),
    "defish_pos": ((320, 240), 39, 29, [("defish", (60.0,))]),
    "defish_neg": ((320, 240), 39, 29, [("defish", (-45.0,))]),
    "ortho": ((320, 240), 39, 29, [("orthographic", (40.0,))]),
    "stereo": ((320, 240), 39, 29, [("stereographic", (50.0,))]),
    "fliph": ((320, 240), 39, 29, [("flip_horz", ())]),
    "flipv": ((320, 240), 39, 29, [("flip_vert", ())]),
    "hstretch": ((320, 240), 39, 29,
                 [("horizontal_stretch_poly", (0.2, 0.1, 0.05))]),
    "gopro_rect": ((320, 240), 39, 29,
                   [("gopro_to_rectilinear", (0.8811,))]),
    "repoint_h4_h4": ((320, 240), 39, 29,
                      [("repoint_src_to_dst",
                        (0.9, 0.2, -0.1, 0.05, L.HERO4, L.HERO4))]),
    "repoint_h4_rect": ((320, 240), 39, 29,
                        [("repoint_src_to_dst",
                          (0.9306, 0.0, 0.0, 0.0, L.HERO4,
                           L.RECTILINEAR))]),
    "repoint_equi": ((320, 160), 49, 25,
                     [("repoint_src_to_dst",
                       (1.00623, 0.3, 0.15, -0.1, L.EQUIRECT,
                        L.EQUIRECT))]),
    "repoint_h3": ((320, 240), 39, 29,
                   [("repoint_src_to_dst",
                     (1.0, 0.1, 0.0, 0.0, L.HERO3BLACK, L.HERO4))]),
    "custom_lens": ((320, 240), 39, 29,
                    [("set_custom_lens",
                      ([80.0, 3.0, -15.0, 7.0, 0.0, 0.01],
                       [82.0, 2.0, -16.0, 8.0, 0.0, 0.02])),
                     ("repoint_src_to_dst",
                      (1.0, 0.1, -0.05, 0.0, L.CUSTOM_LENS,
                       L.CUSTOM_LENS))]),
    "sphere_stack": ((320, 240), 39, 29,
                     [("rotate", (5.0,)), ("scale", (1.1, 1.1)),
                      ("defish", (30.0,)),
                      ("repoint_src_to_dst",
                       (0.9306, 0.15, -0.08, 0.02, L.HERO4, L.HERO4))]),
    "scale_out": ((320, 240), 39, 29, [("scale", (0.6, 0.6))]),
}

FMT = {"yuy2": L.FORMAT_YUY2, "bgra": L.FORMAT_32BGRA,
       "b64a": L.FORMAT_64ARGB, "rg48": L.FORMAT_RG48,
       "wp13": L.FORMAT_WP13, "w13a": L.FORMAT_W13A}
BPP = {"yuy2": 2, "bgra": 4, "b64a": 8, "rg48": 6, "wp13": 6, "w13a": 8}


def _golden(name):
    with open(os.path.join(GOLD, name), "rb") as f:
        return f.read()


def build(name, fmt="yuy2", fill=0):
    (w, h), mw, mh, steps = CASES[name]
    gm = gmref.GeoMesh(mw, mh)
    gm.init(w, h, w * BPP[fmt], FMT[fmt], w, h, w * BPP[fmt], FMT[fmt],
            fill)
    for t, args in steps:
        if t == "set_custom_lens":
            gm.set_custom_lens(*args)
        else:
            getattr(gm, "transform_" + t)(*args)
    return gm, w, h


def _test_image(w, h, fmt):
    rng = np.random.default_rng(12345)
    if fmt == "yuy2":
        return rng.integers(0, 256, (h, 2 * w), np.uint8).tobytes()
    if fmt == "bgra":
        return rng.integers(0, 256, (h, 4 * w), np.uint8).tobytes()
    if fmt in ("rg48", "b64a"):
        n = 3 if fmt == "rg48" else 4
        return rng.integers(0, 65536, (h, n * w),
                            np.uint16).astype("<u2").tobytes()
    n = 3 if fmt == "wp13" else 4
    return rng.integers(-1024, 8192, (h, n * w),
                        np.int16).astype("<i2").tobytes()


@pytest.mark.parametrize("name", sorted(CASES))
def test_mesh_bit_exact(name):
    """Every transform produces bit-identical float32 mesh nodes."""
    gm, w, h = build(name)
    raw = _golden(f"mesh_{name}_{w}x{h}.f32")
    n = gm.meshwidth * gm.meshheight
    want_x = np.frombuffer(raw[:4 * n], np.float32).reshape(gm.meshy.shape)
    want_y = np.frombuffer(raw[4 * n:], np.float32).reshape(gm.meshy.shape)
    got_x, got_y = gm.meshx, gm.meshy
    # NaN-safe bit comparison
    assert (got_x.tobytes() == want_x.tobytes()), (
        f"meshx mismatch: {np.abs(got_x - want_x).max()}")
    assert (got_y.tobytes() == want_y.tobytes()), (
        f"meshy mismatch: {np.abs(got_y - want_y).max()}")


APPLY = [
    ("defish_pos", "yuy2", 0),
    ("defish_pos", "bgra", 0),
    ("defish_pos", "rg48", 0),
    ("defish_pos", "b64a", 0),
    ("defish_pos", "wp13", 0),
    ("defish_pos", "w13a", 0),
    ("repoint_h4_h4", "yuy2", 0),
    ("repoint_h4_h4", "rg48", 0),
    ("scale_out", "yuy2", 0),
    ("scale_out", "rg48", 0),
]


@pytest.mark.parametrize("name,fmt,fill", APPLY)
def test_apply_byte_exact(name, fmt, fill):
    """cache_init_bilinear_range + apply_bilinear is byte-exact."""
    w, h = (320, 240) if fmt == "yuy2" else (128, 96)
    gm, _, _ = _build_sized(name, fmt, fill, w, h)
    gm.cache_init_bilinear_range(0, h, gmref.GlibcRand())
    out = gm.apply_bilinear(_test_image(w, h, fmt))
    want = _golden(f"apply_{name}_{fmt}_{w}x{h}_f{fill}.bin")
    assert out.tobytes() == want


def _build_sized(name, fmt, fill, w, h):
    (_, _), mw, mh, steps = CASES[name]
    gm = gmref.GeoMesh(mw, mh)
    gm.init(w, h, w * BPP[fmt], FMT[fmt], w, h, w * BPP[fmt], FMT[fmt],
            fill)
    for t, args in steps:
        if t == "set_custom_lens":
            gm.set_custom_lens(*args)
        else:
            getattr(gm, "transform_" + t)(*args)
    return gm, w, h


def test_apply_backgroundfill_byte_exact():
    """The lensFill path: border pixels pull a clamped source sample
    whose position consumes the glibc rand() stream, then alpha-blend
    into the previous output pixel.  The two fill goldens were generated
    back-to-back in one process, so the stream continues across them."""
    rand = gmref.GlibcRand()
    gm, w, h = _build_sized("scale_out", "yuy2", 1, 320, 240)
    gm.cache_init_bilinear_range(0, h, rand)
    out = gm.apply_bilinear(_test_image(w, h, "yuy2"))
    want = _golden(f"apply_scale_out_yuy2_{w}x{h}_f1.bin")
    assert out.tobytes() == want

    gm, w, h = _build_sized("scale_out", "bgra", 1, 128, 96)
    gm.cache_init_bilinear_range(0, h, rand)
    out = gm.apply_bilinear(_test_image(w, h, "bgra"))
    want = _golden(f"apply_scale_out_bgra_{w}x{h}_f1.bin")
    assert out.tobytes() == want
