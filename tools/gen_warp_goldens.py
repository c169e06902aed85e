#!/usr/bin/env python3
"""Generate WarpLib (GeoMesh) goldens from the compiled reference library.

Calls `geomesh_*` in .refbuild/libgeomesh.so (built from
/root/reference/WarpLib/*.c) the same way the reference decoder's
WarpFrame does (Codec/decoder.c:9133-9420):

    geomesh_create -> geomesh_init -> transforms ->
    geomesh_alloc_cache -> geomesh_cache_init_bilinear_range(0, h) ->
    geomesh_apply_bilinear

and dumps, per case:
  - the sparse mesh node arrays (float32 x then y), golden/warp/mesh_*.f32
  - warped output frames for each pixel format,   golden/warp/apply_*.bin

The library is single-threaded here, so the backgroundfill rand() draws
(GeoMeshCache.c:238-241) are the glibc sequence from the fresh-process
state (seed 1), row-major — deterministic and therefore pinnable.

Run: python tools/gen_warp_goldens.py
"""

import ctypes
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LIB = os.path.join(REPO, ".refbuild", "libgeomesh.so")
OUT = os.path.join(REPO, "tests", "golden", "warp")

FMT = {  # WARPLIB_FORMAT_* (GeoMesh.h:61-68)
    "yuy2": 0x59555932,
    "bgra": 3,            # 32BGRA
    "b64a": 4,            # 64ARGB
    "rg48": 0x52473438,
    "wp13": 0x57503133,
    "w13a": 0x57313341,
}
BPP = {"yuy2": 2, "bgra": 4, "b64a": 8, "rg48": 6, "wp13": 6, "w13a": 8}

RECTILINEAR, FISHEYE, HERO3BLACK, HERO3PLUSBLACK, HERO4 = 0, 1, 2, 3, 4
EQUIRECT, CUSTOM_LENS = 32, 33


def load():
    lib = ctypes.CDLL(LIB)
    lib.geomesh_create.restype = ctypes.c_void_p
    lib.geomesh_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.geomesh_init.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 9
    lib.geomesh_getx.restype = ctypes.c_float
    lib.geomesh_getx.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.geomesh_gety.restype = ctypes.c_float
    lib.geomesh_gety.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    for name, argt in [
        ("geomesh_transform_scale", [ctypes.c_float] * 2),
        ("geomesh_transform_pan", [ctypes.c_float] * 2),
        ("geomesh_transform_rotate", [ctypes.c_float]),
        ("geomesh_transform_fisheye", [ctypes.c_float]),
        ("geomesh_transform_gopro_to_rectilinear", [ctypes.c_float]),
        ("geomesh_transform_defish", [ctypes.c_float]),
        ("geomesh_transform_orthographic", [ctypes.c_float]),
        ("geomesh_transform_stereographic", [ctypes.c_float]),
        ("geomesh_transform_flip_horz", []),
        ("geomesh_transform_flip_vert", []),
        ("geomesh_transform_horizontal_stretch_poly", [ctypes.c_float] * 3),
        ("geomesh_transform_repoint_src_to_dst",
         [ctypes.c_float] * 4 + [ctypes.c_int] * 2),
        ("geomesh_alloc_cache", []),
        ("geomesh_cache_init_bilinear", []),
        ("geomesh_cache_init_bilinear_range", [ctypes.c_int] * 2),
    ]:
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p] + argt
    lib.geomesh_set_custom_lens.restype = ctypes.c_int
    lib.geomesh_set_custom_lens.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.geomesh_apply_bilinear.restype = ctypes.c_int
    lib.geomesh_apply_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int]
    return lib


def dump_mesh(lib, gm, mw, mh, path):
    xs = np.empty((mh, mw), np.float32)
    ys = np.empty((mh, mw), np.float32)
    for r in range(mh):
        for c in range(mw):
            xs[r, c] = lib.geomesh_getx(gm, r, c)
            ys[r, c] = lib.geomesh_gety(gm, r, c)
    with open(path, "wb") as f:
        f.write(xs.tobytes())
        f.write(ys.tobytes())


def test_image(w, h, fmt):
    """Deterministic content, full value range, channel-distinct."""
    rng = np.random.default_rng(12345)
    if fmt == "yuy2":
        return rng.integers(0, 256, (h, 2 * w), np.uint8).tobytes()
    if fmt == "bgra":
        return rng.integers(0, 256, (h, 4 * w), np.uint8).tobytes()
    if fmt in ("rg48", "b64a"):
        n = 3 if fmt == "rg48" else 4
        return rng.integers(0, 65536, (h, n * w),
                            np.uint16).astype("<u2").tobytes()
    if fmt in ("wp13", "w13a"):
        n = 3 if fmt == "wp13" else 4
        return rng.integers(-1024, 8192, (h, n * w),
                            np.int16).astype("<i2").tobytes()
    raise ValueError(fmt)


# (name, (srcw, srch), meshw, meshh, [(transform, args), ...])
CASES = [
    ("identity", (320, 240), 39, 29, []),
    ("scale", (320, 240), 39, 29, [("scale", (1.25, 0.8))]),
    ("pan", (320, 240), 39, 29, [("pan", (10.5, -6.25))]),
    ("rotate", (320, 240), 39, 29, [("rotate", (15.0,))]),
    ("fisheye_neg", (320, 240), 39, 29, [("fisheye", (-45.0,))]),
    ("fisheye_pos", (320, 240), 39, 29, [("fisheye", (30.0,))]),
    ("defish_pos", (320, 240), 39, 29, [("defish", (60.0,))]),
    ("defish_neg", (320, 240), 39, 29, [("defish", (-45.0,))]),
    ("ortho", (320, 240), 39, 29, [("orthographic", (40.0,))]),
    ("stereo", (320, 240), 39, 29, [("stereographic", (50.0,))]),
    ("fliph", (320, 240), 39, 29, [("flip_horz", ())]),
    ("flipv", (320, 240), 39, 29, [("flip_vert", ())]),
    ("hstretch", (320, 240), 39, 29,
     [("horizontal_stretch_poly", (0.2, 0.1, 0.05))]),
    ("gopro_rect", (320, 240), 39, 29,
     [("gopro_to_rectilinear", (0.8811,))]),
    ("repoint_h4_h4", (320, 240), 39, 29,
     [("repoint_src_to_dst", (0.9, 0.2, -0.1, 0.05, HERO4, HERO4))]),
    ("repoint_h4_rect", (320, 240), 39, 29,
     [("repoint_src_to_dst", (0.9306, 0.0, 0.0, 0.0, HERO4, RECTILINEAR))]),
    ("repoint_equi", (320, 160), 49, 25,
     [("repoint_src_to_dst",
       (1.00623, 0.3, 0.15, -0.1, EQUIRECT, EQUIRECT))]),
    ("repoint_h3", (320, 240), 39, 29,
     [("repoint_src_to_dst", (1.0, 0.1, 0.0, 0.0, HERO3BLACK, HERO4))]),
    ("custom_lens", (320, 240), 39, 29,
     [("set_custom_lens", ([80.0, 3.0, -15.0, 7.0, 0.0, 0.01],
                           [82.0, 2.0, -16.0, 8.0, 0.0, 0.02])),
      ("repoint_src_to_dst", (1.0, 0.1, -0.05, 0.0,
                              CUSTOM_LENS, CUSTOM_LENS))]),
    # WarpFrame's lensSphere==1 stack order (decoder.c:9246-9280)
    ("sphere_stack", (320, 240), 39, 29,
     [("rotate", (5.0,)), ("scale", (1.1, 1.1)), ("defish", (30.0,)),
      ("repoint_src_to_dst", (0.9306, 0.15, -0.08, 0.02, HERO4, HERO4))]),
]

# apply cases: (case_name, fmt, (w, h), backgroundfill)
APPLY = [
    ("defish_pos", "yuy2", (320, 240), 0),
    ("defish_pos", "bgra", (128, 96), 0),
    ("defish_pos", "rg48", (128, 96), 0),
    ("defish_pos", "b64a", (128, 96), 0),
    ("defish_pos", "wp13", (128, 96), 0),
    ("defish_pos", "w13a", (128, 96), 0),
    ("repoint_h4_h4", "yuy2", (320, 240), 0),
    ("repoint_h4_h4", "rg48", (128, 96), 0),
    ("scale_out", "yuy2", (320, 240), 0),   # zoom out: out-of-range borders
    ("scale_out", "rg48", (128, 96), 0),
    ("scale_out", "yuy2", (320, 240), 1),   # backgroundfill rand() path
    ("scale_out", "bgra", (128, 96), 1),
]
CASES.append(("scale_out", (320, 240), 39, 29, [("scale", (0.6, 0.6))]))


def build_mesh(lib, name, w, h, mw, mh, steps, fmt, fill):
    gm = lib.geomesh_create(mw, mh)
    assert lib.geomesh_init(gm, w, h, w * BPP[fmt], FMT[fmt],
                            w, h, w * BPP[fmt], FMT[fmt], fill) == 0
    for t, args in steps:
        if t == "set_custom_lens":
            src = (ctypes.c_float * 6)(*args[0])
            dst = (ctypes.c_float * 6)(*args[1])
            assert lib.geomesh_set_custom_lens(gm, src, dst, 24) == 0
        else:
            f = getattr(lib, "geomesh_transform_" + t)
            cargs = [ctypes.c_float(a) if isinstance(a, float) else a
                     for a in args]
            assert f(gm, *cargs) == 0
    return gm


def main():
    os.makedirs(OUT, exist_ok=True)
    lib = load()
    by_name = {c[0]: c for c in CASES}

    for name, (w, h), mw, mh, steps in CASES:
        gm = build_mesh(lib, name, w, h, mw, mh, steps, "yuy2", 0)
        dump_mesh(lib, gm, mw, mh,
                  os.path.join(OUT, f"mesh_{name}_{w}x{h}.f32"))
        print(f"mesh {name} {w}x{h} mesh {mw}x{mh}")

    # apply goldens in a FIXED order (the fill=1 cases consume the
    # process-global glibc rand stream; order defines the sequence)
    for name, fmt, (w, h), fill in APPLY:
        _, _, mw, mh, steps = by_name[name]
        gm = build_mesh(lib, name, w, h, mw, mh, steps, fmt, fill)
        assert lib.geomesh_alloc_cache(gm) == 0
        assert lib.geomesh_cache_init_bilinear_range(gm, 0, h) == 0
        src = test_image(w, h, fmt)
        # 16-byte zeroed prefix: the YUY2 backgroundfill blend reads
        # *(destptr-2)/*(destptr-4) at row 0 col 0/1 (GeoMeshApply.c:209),
        # which is memory before the output buffer in the reference —
        # pin it to zeros so the golden is deterministic
        buf = ctypes.create_string_buffer(len(src) + 16)
        dest = ctypes.cast(ctypes.byref(buf, 16), ctypes.c_char_p)
        assert lib.geomesh_apply_bilinear(gm, src, dest, 0, h) == 0
        fn = f"apply_{name}_{fmt}_{w}x{h}_f{fill}.bin"
        with open(os.path.join(OUT, fn), "wb") as f:
            f.write(buf.raw[16:16 + len(src)])
        print(f"apply {name} {fmt} {w}x{h} fill={fill}")


if __name__ == "__main__":
    sys.exit(main())
