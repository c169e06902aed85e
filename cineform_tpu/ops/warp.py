"""GeoMesh lens/360 warp engine as a JAX resampler (WarpLib equivalent).

The reference (`WarpLib/GeoMesh.h:112-199`) builds a sparse mesh of source
coordinates per destination grid point (fisheye<->rectilinear, stereographic
defish, equirectangular repointing, rotation), caches it, and applies it
with bilinear sampling (`WarpLib/GeoMeshApply.c`).

Here the mesh is a dense (H, W, 2) source-coordinate field computed with
vectorized math (cheap at build time, cached by the caller), and apply is a
batched bilinear gather — the natural TPU formulation of
`geomesh_apply_bilinear`.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mesh builders (geomesh_transform_* equivalents, WarpLib/GeoMeshTransform.c)
# ---------------------------------------------------------------------------

def mesh_identity(h: int, w: int) -> np.ndarray:
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    return np.stack([yy, xx], axis=-1)


def mesh_rotate(h: int, w: int, degrees: float) -> np.ndarray:
    """In-plane rotation about the image center (geomesh_transform_rotate)."""
    t = math.radians(degrees)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    m = mesh_identity(h, w)
    y = m[..., 0] - cy
    x = m[..., 1] - cx
    ys = y * math.cos(t) - x * math.sin(t) + cy
    xs = y * math.sin(t) + x * math.cos(t) + cx
    return np.stack([ys, xs], axis=-1).astype(np.float32)


def mesh_defish(h: int, w: int, fov_degrees: float = 120.0,
                strength: float = 1.0) -> np.ndarray:
    """Fisheye -> rectilinear correction (geomesh_transform_defish,
    `WarpLib/GeoMeshTransform.c`): map each rectilinear destination ray back
    to the equidistant-fisheye source radius."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    half_fov = math.radians(fov_degrees) / 2.0
    m = mesh_identity(h, w)
    y = (m[..., 0] - cy) / cx
    x = (m[..., 1] - cx) / cx
    r = np.sqrt(x * x + y * y)
    r = np.where(r < 1e-6, 1e-6, r)
    theta = np.arctan(r * math.tan(half_fov))      # rectilinear ray angle
    r_src = theta / half_fov                        # equidistant fisheye
    scale = 1.0 + strength * (r_src / r - 1.0)
    ys = y * scale * cx + cy
    xs = x * scale * cx + cx
    return np.stack([ys, xs], axis=-1).astype(np.float32)


def mesh_repoint_equirect(h: int, w: int, yaw: float = 0.0,
                          pitch: float = 0.0) -> np.ndarray:
    """Equirectangular repointing (geomesh_transform_repoint): rotate the
    viewing sphere by yaw/pitch degrees."""
    yawr, pitchr = math.radians(yaw), math.radians(pitch)
    m = mesh_identity(h, w)
    lon = (m[..., 1] / (w - 1) - 0.5) * 2 * math.pi
    lat = (0.5 - m[..., 0] / (h - 1)) * math.pi
    # unit vector
    cx = np.cos(lat) * np.sin(lon)
    cyv = np.sin(lat)
    cz = np.cos(lat) * np.cos(lon)
    # pitch about x then yaw about y
    y2 = cyv * math.cos(pitchr) - cz * math.sin(pitchr)
    z2 = cyv * math.sin(pitchr) + cz * math.cos(pitchr)
    x3 = cx * math.cos(yawr) + z2 * math.sin(yawr)
    z3 = -cx * math.sin(yawr) + z2 * math.cos(yawr)
    lon2 = np.arctan2(x3, z3)
    lat2 = np.arcsin(np.clip(y2, -1, 1))
    ys = (0.5 - lat2 / math.pi) * (h - 1)
    xs = (lon2 / (2 * math.pi) + 0.5) * (w - 1)
    return np.stack([ys, xs], axis=-1).astype(np.float32)


def _center_radius(mesh: np.ndarray, h: int, w: int):
    cy, cx = h / 2.0, w / 2.0
    y = mesh[..., 0] - cy
    x = mesh[..., 1] - cx
    r = np.sqrt(x * x + y * y)
    return y, x, np.where(r < 1e-6, 1e-6, r), cy, cx


def _radial(mesh: np.ndarray, h: int, w: int, fn) -> np.ndarray:
    """Apply a radial source-radius remapping r -> fn(r) about the center
    (the shared shape of the reference's radial transforms)."""
    y, x, r, cy, cx = _center_radius(mesh, h, w)
    s = fn(r) / r
    return np.stack([y * s + cy, x * s + cx], axis=-1).astype(np.float32)


def mesh_scale(mesh: np.ndarray, rowscale: float, colscale: float) -> np.ndarray:
    """geomesh_transform_scale: scale source coords about the center."""
    h, w = mesh.shape[:2]
    y, x, _, cy, cx = _center_radius(mesh, h, w)
    return np.stack([y * rowscale + cy, x * colscale + cx], -1).astype(np.float32)


def mesh_pan(mesh: np.ndarray, left: float, top: float) -> np.ndarray:
    """geomesh_transform_pan: shift source coordinates."""
    out = np.array(mesh, copy=True)
    out[..., 0] += top
    out[..., 1] += left
    return out


def mesh_flip(mesh: np.ndarray, horizontal: bool = True) -> np.ndarray:
    """geomesh_transform_flip_horz / _vert."""
    h, w = mesh.shape[:2]
    out = np.array(mesh, copy=True)
    if horizontal:
        out[..., 1] = (w - 1) - out[..., 1]
    else:
        out[..., 0] = (h - 1) - out[..., 0]
    return out


def mesh_fisheye(h: int, w: int, max_theta_degrees: float) -> np.ndarray:
    """Rectilinear -> equidistant fisheye (geomesh_transform_fisheye):
    destination radius maps to theta = atan(r/f), source r = f*theta-scaled."""
    f = math.sqrt(w * w + h * h) / 2.0 / math.tan(math.radians(max_theta_degrees))
    return _radial(mesh_identity(h, w), h, w, lambda r: f * np.arctan(r / f))


def mesh_orthographic(h: int, w: int, max_theta_degrees: float) -> np.ndarray:
    """geomesh_transform_orthographic: source r = f*sin(atan(r/f))."""
    f = math.sqrt(w * w + h * h) / 2.0 / math.tan(math.radians(max_theta_degrees))
    return _radial(mesh_identity(h, w), h, w,
                   lambda r: f * np.sin(np.arctan(r / f)))


def mesh_stereographic(h: int, w: int, max_theta_degrees: float) -> np.ndarray:
    """geomesh_transform_stereographic: source r = 2f*tan(atan(r/f)/2)."""
    f = math.sqrt(w * w + h * h) / 2.0 / math.tan(math.radians(max_theta_degrees))
    return _radial(mesh_identity(h, w), h, w,
                   lambda r: 2 * f * np.tan(np.arctan(r / f) / 2))


def mesh_gopro_to_rectilinear(h: int, w: int,
                              sensorcrop: float = 1.0) -> np.ndarray:
    """geomesh_transform_gopro_to_rectilinear: the GoPro cubic lens model
    theta(r) = -12.0479 r^3 + 5.3339 r^2 + 80.5605 r degrees (r normalized
    to the half-diagonal and scaled by the sensor crop), mapped back to a
    rectilinear destination (`WarpLib/GeoMeshTransform.c:215`)."""
    maxradius = math.sqrt(w * w + h * h) / 2.0

    def fn(r):
        rn = (r / maxradius) * sensorcrop
        theta = np.where(rn < 1.0,
                         -12.047899 * rn ** 3 + 5.3339 * rn ** 2 + 80.560545 * rn,
                         -8.94 * rn ** 2 + 70.92 * rn + 11.85)
        # destination rectilinear radius for this ray angle
        return np.tan(np.radians(np.clip(theta, 0, 89.0))) \
            / math.tan(math.radians(80.560545 * sensorcrop)) * maxradius

    # invert numerically: sample the forward curve and interpolate
    rr = np.linspace(0, maxradius * 1.5, 2048)
    dd = fn(rr)
    y, x, r, cy, cx = _center_radius(mesh_identity(h, w), h, w)
    rsrc = np.interp(r, dd, rr)
    s = rsrc / r
    return np.stack([y * s + cy, x * s + cx], axis=-1).astype(np.float32)


def mesh_horizontal_stretch_poly(mesh: np.ndarray, a: float, b: float,
                                 c: float) -> np.ndarray:
    """geomesh_transform_horizontal_stretch_poly: per-row horizontal
    stretch x -= W*(2x/W-1)*(a*yn^2 + b*yn + c) (GoPro SuperView-style
    anamorphic corrector, `GeoMeshTransform.c:528`)."""
    h, w = mesh.shape[:2]
    out = np.array(mesh, copy=True)
    xn = out[..., 1] / w
    yn = out[..., 0] / h - 0.5
    out[..., 1] = out[..., 1] - w * (2 * xn - 1) * (a * yn * yn + b * yn + c)
    return out


# GoPro camera presets: (sensorcrop, stretch a) per (product, fov) family —
# a compact functional stand-in for the per-resolution calibration tables in
# `WarpLib/GeoMeshGoPro.c` (wide/medium/narrow crops; SuperView stretch).
GOPRO_PRESETS = {
    ("hero3", "wide"): {"sensorcrop": 1.0},
    ("hero3", "medium"): {"sensorcrop": 0.75},
    ("hero3", "narrow"): {"sensorcrop": 0.5},
    ("hero4", "superview"): {"sensorcrop": 1.0,
                             "stretch": (0.21, 0.0, 0.0)},
}


def mesh_gopro_preset(h: int, w: int, product: str = "hero3",
                      fov: str = "wide") -> np.ndarray:
    p = GOPRO_PRESETS[(product, fov)]
    mesh = mesh_gopro_to_rectilinear(h, w, p["sensorcrop"])
    if "stretch" in p:
        mesh = mesh_horizontal_stretch_poly(mesh, *p["stretch"])
    return mesh


# ---------------------------------------------------------------------------
# Apply (geomesh_apply_bilinear equivalent)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("wrap_x",))
def warp_bilinear(image: jnp.ndarray, mesh: jnp.ndarray,
                  wrap_x: bool = False) -> jnp.ndarray:
    """Bilinear resample: image (..., H, W, C) by mesh (H', W', 2) source
    coordinates (y, x).  wrap_x wraps horizontally (360 content)."""
    h, w = image.shape[-3], image.shape[-2]
    ys, xs = mesh[..., 0], mesh[..., 1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0i = x0.astype(jnp.int32)
    if wrap_x:
        x0i = jnp.mod(x0i, w)
        x1 = jnp.mod(x0i + 1, w)
    else:
        x0i = jnp.clip(x0i, 0, w - 1)
        x1 = jnp.clip(x0i + 1, 0, w - 1)
    p00 = image[..., y0, x0i, :]
    p01 = image[..., y0, x1, :]
    p10 = image[..., y1, x0i, :]
    p11 = image[..., y1, x1, :]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy
