"""Lens-correction decode stage: the reference's WarpFrame pipeline.

Models the metadata-driven mesh warp the reference decoder runs on the
final output buffer (`WarpFrame`, Codec/decoder.c:9133-9445):

  1. `OverrideCFHDDATA` parses the sample's metadata chunks into
     CFHDDATA lens fields (DemoasicFrames.cpp:5546-5556, 6293-6321);
  2. `CopyMetadataForPreset` decides `doMesh` and folds the framing
     offsets into the Lens* fields (lutpath.cpp:1980-2042);
  3. `WarpFrame` picks a mesh size and source lens from the frame
     aspect, stacks the transforms, builds the bilinear cache and warps
     the output in place (decoder.c:9145-9443).

All math runs through the exact float32 GeoMesh model
(`cineform_tpu/ref/geomesh.py`), so a decode with lens metadata is
byte-exact vs the reference binary (tests/test_warp_decode.py) for the
deterministic lensFill=0 path.  With lensFill=1 the reference draws
border samples from the process-global glibc rand() stream across a
thread race (GeoMeshCache.c:238, Codec/bayer.c:10881) — our
implementation uses a fresh seed-1 stream, deterministic but pinned only
against the single-threaded library oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import numpy as np

from cineform_tpu.ref import geomesh as gmref

f4 = np.float32

# decoder.c:48 defines PI as the FLOAT constant 3.14159265359f and
# DEG2RAD as PI*(d)/180.0f — all single precision (unlike WarpLib's
# double PI)
PI_F = f4(3.14159265359)


def _deg2rad_f(d) -> np.float32:
    return PI_F * f4(d) / f4(180.0)


@dataclass
class LensParams:
    """The CFHDDATA lens fields after CopyMetadataForPreset."""

    lens_gopro: int = 1       # LGPR (default lutpath.cpp:1005)
    lens_sphere: int = 0      # LSPH
    lens_fill: int = 0        # LFIL
    lens_style: int = 0       # LSTL
    offset_x: float = 0.0     # LensOffsetX (<- -OFFX)
    offset_y: float = 0.0     # LensOffsetY (<- OFFY)
    offset_r: float = 0.0     # LensOffsetR (<- OFFR)
    fish_fov: float = 0.0     # LensFishFOV (<- OFFF)
    offset_z: float = 1.0     # LensOffsetZ (<- FrameHScale, HSCL)
    zoom: float = 1.0         # LensZoom (<- FrameZoom, ZOOM)
    custom_src: tuple = (0.0,) * 6   # LSRC
    custom_dst: tuple = (0.0,) * 6   # LDST

    def key(self):
        return tuple(getattr(self, f.name) for f in fields(self))


def _clampf(v, lo, hi):
    v = f4(v)
    if v < lo:
        v = f4(lo)
    if v > hi:
        v = f4(hi)
    return float(v)


def parse_lens_metadata(sample: bytes) -> LensParams | None:
    """Parse the lens/framing tags from the sample's metadata and apply
    the doMesh decision (lutpath.cpp:1982-2040).  Returns None when the
    decoder would not warp."""
    from cineform_tpu import metadata as md

    items = {}
    try:
        for item in md.read_metadata(sample):
            items[item.tag] = item
    except Exception:
        return None
    if not items:
        return None

    def flt(tag, default=0.0):
        it = items.get(tag)
        if it is None or len(it.payload) < 4:
            return default
        return float(np.frombuffer(it.payload[:4], "<f4")[0])

    def ul(tag, default=0):
        it = items.get(tag)
        if it is None or len(it.payload) < 4:
            return default
        return int.from_bytes(it.payload[:4], "little")

    p = LensParams()
    p.lens_gopro = ul("LGPR", 1)
    p.lens_sphere = ul("LSPH", 0)
    p.lens_fill = ul("LFIL", 0)
    p.lens_style = ul("LSTL", 0)
    # tag clamps from DemoasicFrames.cpp:6293-6321; OFFX is negated
    frame_off_x = -_clampf(flt("OFFX"), -0.5, 0.5)
    frame_off_y = _clampf(flt("OFFY"), -0.5, 0.5)
    frame_off_r = _clampf(flt("OFFR"), -0.5, 0.5)
    frame_off_f = _clampf(flt("OFFF"), -90.0, 90.0)
    frame_zoom = _clampf(flt("ZOOM", 1.0), 0.10, 4.0)
    frame_hscale = flt("HSCL", 1.0)
    if "LSRC" in items and len(items["LSRC"].payload) >= 24:
        p.custom_src = tuple(np.frombuffer(
            items["LSRC"].payload[:24], "<f4").tolist())
    if "LDST" in items and len(items["LDST"].payload) >= 24:
        p.custom_dst = tuple(np.frombuffer(
            items["LDST"].payload[:24], "<f4").tolist())

    do_mesh = False
    if p.lens_gopro == 0 and p.lens_sphere == 1:
        do_mesh = True
    if p.lens_fill == 1 and (frame_off_x != 0.0 or frame_off_y != 0.0
                             or frame_off_r != 0.0 or frame_off_f != 0.0
                             or frame_zoom < 1.0):
        do_mesh = True
    if p.lens_sphere == 1:
        do_mesh = True
    if (p.lens_sphere == 1 and frame_off_r != 0.0) or \
            abs(frame_off_r) > 0.01:
        do_mesh = True
    if p.lens_gopro >= 2:
        do_mesh = True
    if not do_mesh:
        return None
    p.zoom = frame_zoom
    p.offset_x = frame_off_x
    p.offset_y = frame_off_y
    p.offset_r = frame_off_r
    p.fish_fov = frame_off_f
    p.offset_z = frame_hscale
    return p


# output fourcc -> WARPLIB format (decoder.c:9230-9242)
_WARP_FORMATS = {
    "YUY2": gmref.FORMAT_YUY2,
    "BGRA": gmref.FORMAT_32BGRA,
    "W13A": gmref.FORMAT_W13A,
    "WP13": gmref.FORMAT_WP13,
    "RG48": gmref.FORMAT_RG48,
    "b64a": gmref.FORMAT_64ARGB,
}


def warp_supported(fourcc: str) -> bool:
    return fourcc in _WARP_FORMATS


def _approx_equal(x: int, y: int) -> bool:
    """approx_equal (decoder.c:9101-9121)."""
    if y > 1080:
        x >>= 6
        y >>= 6
    elif y > 540:
        x >>= 5
        y >>= 5
    else:
        x >>= 4
        y >>= 4
    return x == y or x + 1 == y or x == y + 1


def build_mesh(p: LensParams, width: int, height: int, pitch: int,
               fourcc: str) -> gmref.GeoMesh:
    """WarpFrame's mesh construction (decoder.c:9160-9310)."""
    fmt = _WARP_FORMATS[fourcc]

    if _approx_equal(width, height * 2):          # ~2:1 equirect
        srclens = gmref.EQUIRECT
        sensorcrop = 1.00623
        if p.custom_src[1]:
            aspect = f4(p.custom_src[0]) / f4(p.custom_src[1])
            if 1.0 <= aspect <= 3.0:
                if f4(aspect) * f4(0.99) < f4(4.0 / 3.0) < \
                        f4(aspect) * f4(1.01):
                    sensorcrop = float(
                        gmref.sqrtf(f4(width * width + height * height))
                        / gmref.sqrtf(f4((width * 2 // 3) ** 2
                                         + height * height)))
        if width >= 2496:
            mesh = gmref.GeoMesh(199, 99)
        elif width >= 1272:
            mesh = gmref.GeoMesh(99, 49)
        else:
            mesh = gmref.GeoMesh(49, 25)
        phi = f4(p.offset_x) * _deg2rad_f(720.0)
        theta = f4(p.offset_y) * _deg2rad_f(720.0)
    elif _approx_equal(width * 3, height * 4):    # ~4:3
        srclens = gmref.HERO4
        sensorcrop = 1.0
        if width > 2880:
            mesh = gmref.GeoMesh(159, 119)
        elif width >= 1920:
            mesh = gmref.GeoMesh(79, 59)
        else:
            mesh = gmref.GeoMesh(39, 29)
        phi = f4(p.offset_x) * _deg2rad_f(120.0)
        theta = f4(p.offset_y) * _deg2rad_f(98.0)
    else:                                         # ~16:9 and the rest
        srclens = gmref.HERO4
        sensorcrop = float(
            gmref.sqrtf(f4(1920 * 1920 + 1080 * 1080))
            / gmref.sqrtf(f4(2000 * 2000 + 1500 * 1500)))
        if width > 2880:
            mesh = gmref.GeoMesh(159, 119)
        elif width >= 1920:
            mesh = gmref.GeoMesh(79, 59)
        else:
            mesh = gmref.GeoMesh(39, 29)
        phi = f4(p.offset_x) * _deg2rad_f(120.0)
        theta = f4(p.offset_y) * _deg2rad_f(70.0)
    rho = (f4(p.offset_z) - f4(1.0)) * f4(4.0) * _deg2rad_f(360.0)

    mesh.init(width, height, pitch, fmt, width, height, pitch, fmt,
              p.lens_fill)

    if p.lens_sphere == 1:
        if p.lens_gopro != 2:
            if p.offset_r != 0.0:
                r = f4(p.offset_r)
                angle = f4(360.0) * r * r * f4(2.1)
                if p.offset_r < 0.0:
                    angle = -angle
                mesh.transform_rotate(angle)
            if p.zoom != 1.0:
                mesh.transform_scale(p.zoom, p.zoom)
            if p.fish_fov != 0.0:
                fov = _clampf(p.fish_fov, -89.9, 89.9)
                if fov:
                    mesh.transform_defish(fov)
        if p.lens_gopro == 0:
            mesh.transform_repoint_src_to_dst(
                sensorcrop, phi, theta, rho, srclens, gmref.RECTILINEAR)
        elif p.lens_gopro == 1:
            mesh.transform_repoint_src_to_dst(
                sensorcrop, phi, theta, rho, srclens, gmref.HERO4)
        elif p.lens_gopro == 2:
            mesh.transform_repoint_src_to_dst(
                sensorcrop, phi, theta, rho, srclens, gmref.EQUIRECT)
        elif p.lens_gopro == 4:
            mesh.set_custom_lens(p.custom_src, p.custom_dst)
            src = gmref.EQUIRECT if srclens == gmref.EQUIRECT \
                else gmref.CUSTOM_LENS
            mesh.transform_repoint_src_to_dst(
                sensorcrop, phi, theta, rho, src, gmref.CUSTOM_LENS)
    else:
        if p.zoom != 1.0:
            mesh.transform_scale(p.zoom, p.zoom)
        if p.offset_x != 0.0 or p.offset_y != 0.0:
            mesh.transform_pan(f4(p.offset_x) * f4(width),
                               -f4(p.offset_y) * f4(height))
        if p.offset_r != 0.0:
            angle = (f4(360.0)
                     * gmref.asinf(f4(p.offset_r) * f4(1.7777777777))
                     / (f4(2.0) * f4(3.14159)))
            mesh.transform_rotate(angle)
        if p.lens_gopro == 0:
            mesh.transform_gopro_to_rectilinear(sensorcrop)

    mesh.alloc_cache()
    mesh.cache_init_bilinear_range(0, height, gmref.GlibcRand())
    return mesh


def blur_vertical(mesh: gmref.GeoMesh, out: np.ndarray) -> None:
    """geomesh_blur_vertical_range (GeoMeshCache.c:288-378): soften the
    backgroundfill border areas vertically, in place.  Channel indexing
    quirks (ch 2+ blending against the OPPOSITE row in the top half) are
    the reference's."""
    h, w = mesh.destheight, mesh.destwidth
    pitch = mesh.deststride
    bpp = mesh.srcbpp
    nch = 2 if mesh.srcsubsampled else mesh.srcchannels
    alpha = mesh.cache[..., mesh.num_elements - 1]

    def blend_rows(rows, off01, off2):
        for row in rows:
            a = np.minimum(alpha[row] * 32, 200)
            sel = a > 0
            if not sel.any():
                continue
            base = w * bpp * row
            for col in np.nonzero(sel)[0]:
                av = int(a[col])
                p = base + bpp * int(col)
                for ch in (0, 1):
                    q = p + ch
                    out[q] = (int(out[q]) * (256 - av)
                              + int(out[q + off01]) * av + 128) >> 8
                if not mesh.srcsubsampled:
                    chs = (2, 3) if mesh.srcchannels > 3 else (2,)
                    for ch in chs:
                        q = p + ch
                        if 0 <= q + off2 < out.size:
                            out[q] = (int(out[q]) * (256 - av)
                                      + int(out[q + off2]) * av
                                      + 128) >> 8

    blend_rows(range(h // 2, 0, -1), pitch, -pitch)
    blend_rows(range(h // 2, h - 1), -pitch, -pitch)


def warp_decode(p: LensParams, sample: bytes, width: int, height: int,
                fourcc: str, mesh_cache: dict | None = None) -> bytes:
    """The doMesh decode detour (decoder.c:10648-10706, 11125-11136):
    with a mesh warp pending, the reference decodes into a signed-13-bit
    WP13 LOCAL buffer (internal_format, white_point 13), runs WarpFrame
    on THAT buffer, then converts to the requested output format via
    ProcessLine3D -> ConvertLinesToOutput.  Output levels therefore
    differ from the direct decode path (video-safe matrix) — warping the
    direct output would be wrong.  Byte-exact for YUY2/UYVY (the
    ConvertLinesToOutput YUYV branch, already pinned by the Bayer
    develop path) and WP13 (identity store)."""
    from cineform_tpu.models import intra_host
    from cineform_tpu.ref import demosaic as dm

    wp13 = intra_host.decode_sample_to(sample, "WP13")
    warped = warp_output(p, wp13, width, height, "WP13", mesh_cache)
    if fourcc == "WP13":
        return warped.tobytes()
    rgb = np.frombuffer(warped.tobytes(), "<i2").reshape(
        height, width, 3).astype(np.int64)
    if fourcc in ("YUY2", "2vuy"):
        return dm.convert_rgb16_to_yuyv(rgb, whitepoint=13,
                                        uyvy=fourcc == "2vuy")
    raise ValueError(f"warp_decode to {fourcc} not supported")


def warp_output(p: LensParams, out: bytes | np.ndarray, width: int,
                height: int, fourcc: str,
                mesh_cache: dict | None = None) -> np.ndarray:
    """Apply WarpFrame to a decoded output frame; returns the warped
    flat uint8 buffer.  `mesh_cache` memoizes the built mesh per lens
    parameters like the decoder's lastLens* fields (decoder.c:9146)."""
    flat = np.frombuffer(out, np.uint8) if isinstance(out, bytes) \
        else np.asarray(out, np.uint8).reshape(-1)
    pitch = flat.size // height
    key = (p.key(), width, height, pitch, fourcc)
    mesh = None if mesh_cache is None else mesh_cache.get(key)
    if mesh is None:
        mesh = build_mesh(p, width, height, pitch, fourcc)
        if mesh_cache is not None:
            mesh_cache.clear()
            mesh_cache[key] = mesh
    warped = mesh.apply_bilinear(flat.tobytes())
    if p.lens_fill:
        blur_vertical(mesh, warped)
    return warped
