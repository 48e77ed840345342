"""Affine warping and remapping with OpenCV border-mode semantics.

TPU-native counterpart of the reference's warp call sites:
cv::warpAffine / cv::cuda::warpAffine (src/Stabilizer.cpp:1024-1060,
src/Stabilizer_legacy.cpp:477-498, src/AutoZoomCrop.cpp:270) and
cv::cuda::buildWarpAffineMaps + remap (src/RollCorrection.cpp:146-149).

``warp_affine(img, M)`` computes dst(x, y) = src(M^{-1} [x, y, 1]) with
bilinear sampling, matching cv2.warpAffine without WARP_INVERSE_MAP.
"""

from __future__ import annotations

import jax.numpy as jnp

BORDER_CONSTANT = 0
BORDER_REPLICATE = 1
BORDER_REFLECT = 2
BORDER_WRAP = 3
BORDER_REFLECT_101 = 4

_BORDER_NAMES = {
    "black": BORDER_CONSTANT,
    "constant": BORDER_CONSTANT,
    "replicate": BORDER_REPLICATE,
    "reflect": BORDER_REFLECT,
    "wrap": BORDER_WRAP,
    "reflect_101": BORDER_REFLECT_101,
    "reflect101": BORDER_REFLECT_101,
    "fade": BORDER_CONSTANT,  # fade = constant warp + host-side history blend
}


def border_mode_from_name(name: str) -> int:
    """Map the reference's borderType strings (Stabilizer.cpp:31-38) to codes."""
    return _BORDER_NAMES.get(name.lower(), BORDER_CONSTANT)


def _reflect_index(i: jnp.ndarray, n: int, include_edge: bool) -> jnp.ndarray:
    """Reflect out-of-range indices. include_edge=True -> BORDER_REFLECT
    (edge duplicated: -1 -> 0), False -> BORDER_REFLECT_101 (-1 -> 1)."""
    if n == 1:
        return jnp.zeros_like(i)
    if include_edge:
        period = 2 * n
        i = jnp.mod(i, period)
        return jnp.where(i >= n, period - 1 - i, i)
    period = 2 * (n - 1)
    i = jnp.mod(i, period)
    return jnp.where(i >= n, period - i, i)


def _map_index(i: jnp.ndarray, n: int, mode: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map integer sample index to in-range index + validity (for CONSTANT)."""
    valid = (i >= 0) & (i <= n - 1)
    if mode == BORDER_CONSTANT:
        return jnp.clip(i, 0, n - 1), valid
    if mode == BORDER_REPLICATE:
        return jnp.clip(i, 0, n - 1), jnp.ones_like(valid)
    if mode == BORDER_REFLECT:
        return _reflect_index(i, n, include_edge=True), jnp.ones_like(valid)
    if mode == BORDER_REFLECT_101:
        return _reflect_index(i, n, include_edge=False), jnp.ones_like(valid)
    if mode == BORDER_WRAP:
        return jnp.mod(i, n), jnp.ones_like(valid)
    raise ValueError(f"unknown border mode {mode}")


def sample_bilinear(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                    border_mode: int = BORDER_CONSTANT,
                    border_value: float = 0.0) -> jnp.ndarray:
    """Bilinear sample img (H, W) or (H, W, C) at float coords (xs, ys).

    xs/ys may have any (matching) shape; returns samples with that shape
    (plus trailing C if img has channels).
    """
    has_c = img.ndim == 3
    h, w = img.shape[:2]
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = (xs - x0f).astype(img.dtype if img.dtype == jnp.float32 else jnp.float32)
    fy = (ys - y0f).astype(fx.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(yi, xi):
        ym, yv = _map_index(yi, h, border_mode)
        xm, xv = _map_index(xi, w, border_mode)
        v = img[ym, xm]
        ok = yv & xv
        if border_mode == BORDER_CONSTANT:
            if has_c:
                ok = ok[..., None]
            v = jnp.where(ok, v, border_value)
        return v

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    if has_c:
        fx = fx[..., None]
        fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 affine matrix (cv::invertAffineTransform)."""
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return jnp.stack([jnp.stack([ia, ib, itx]), jnp.stack([ic, id_, ity])])


def warp_affine(img: jnp.ndarray, m: jnp.ndarray,
                out_h: int | None = None, out_w: int | None = None,
                border_mode: int = BORDER_CONSTANT,
                border_value: float = 0.0,
                inverse_map: bool = False) -> jnp.ndarray:
    """cv2.warpAffine: dst(x,y) = src(M^{-1}(x,y)), bilinear.

    m: (2, 3) float affine (dst <- src forward map unless inverse_map).
    """
    out_h = out_h if out_h is not None else img.shape[0]
    out_w = out_w if out_w is not None else img.shape[1]
    minv = m if inverse_map else invert_affine(m)
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    sx = jnp.broadcast_to(sx, (out_h, out_w))
    sy = jnp.broadcast_to(sy, (out_h, out_w))
    return sample_bilinear(img, sx, sy, border_mode, border_value)


def remap_bilinear(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
                   border_mode: int = BORDER_REPLICATE,
                   border_value: float = 0.0) -> jnp.ndarray:
    """cv2.remap with bilinear interpolation (RollCorrection.cpp:148)."""
    return sample_bilinear(img, map_x, map_y, border_mode, border_value)


def warp_perspective(img: jnp.ndarray, h_mat: jnp.ndarray,
                     out_h: int | None = None, out_w: int | None = None,
                     border_mode: int = BORDER_CONSTANT,
                     border_value: float = 0.0,
                     inverse_map: bool = False) -> jnp.ndarray:
    """cv2.warpPerspective: dst(x,y) = src(H^{-1}(x,y)), bilinear.

    h_mat: (3, 3) homography (dst <- src forward map unless inverse_map).
    Reference counterpart: the homography serving config (BASELINE.json
    config 3); the reference itself is affine-only.
    """
    out_h = out_h if out_h is not None else img.shape[0]
    out_w = out_w if out_w is not None else img.shape[1]
    hinv = h_mat if inverse_map else jnp.linalg.inv(h_mat)
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    denom = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    sx = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / denom
    sy = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / denom
    sx = jnp.broadcast_to(sx, (out_h, out_w))
    sy = jnp.broadcast_to(sy, (out_h, out_w))
    return sample_bilinear(img, sx, sy, border_mode, border_value)


def rotation_matrix_2d(center_x, center_y, angle_deg, scale=1.0) -> jnp.ndarray:
    """cv2.getRotationMatrix2D: positive angle rotates CCW (y-down image coords).

    Reference use: RollCorrection.cpp:144.
    """
    a = jnp.deg2rad(angle_deg)
    alpha = scale * jnp.cos(a)
    beta = scale * jnp.sin(a)
    tx = (1.0 - alpha) * center_x - beta * center_y
    ty = beta * center_x + (1.0 - alpha) * center_y
    return jnp.stack([
        jnp.stack([alpha, beta, tx]),
        jnp.stack([-beta, alpha, ty]),
    ]).astype(jnp.float32)


def similarity_matrix(dx, dy, da, scale=1.0) -> jnp.ndarray:
    """The stabilizer's 2x3 rigid matrix (Stabilizer.cpp:902-908):
    [[cos da, -sin da, dx], [sin da, cos da, dy]]."""
    c = jnp.cos(da) * scale
    s = jnp.sin(da) * scale
    return jnp.stack([
        jnp.stack([c, -s, jnp.asarray(dx, jnp.float32) * 1.0]),
        jnp.stack([s, c, jnp.asarray(dy, jnp.float32) * 1.0]),
    ]).astype(jnp.float32)
