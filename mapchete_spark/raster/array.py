"""Core raster array ops (R2-R5 of SURVEY.md §2.3), pure numpy.

The payload convention follows the reference: 3D masked arrays of shape
(bands, height, width) with an explicit nodata value
(mapchete/io/raster/array.py:215-266 prepare_array semantics).  Grids
are described by (bounds, shape) on a north-up axis-aligned transform —
the only transforms the tile pyramid produces — so resampling is exact
index arithmetic instead of GDAL warping.  The reference's default
resampling is 'nearest' (mapchete/config/base.py:535-536); 'average'
and 'bilinear' cover the dyadic pyramid reduce and smooth upsampling.
"""

from __future__ import annotations

import warnings
from typing import Iterable, Sequence, Tuple, Union

import numpy as np

from mapchete_spark.geometry.core import MultiPolygon, Polygon
from mapchete_spark.tilegrid.grid import Bounds

ArrayLike = Union[np.ndarray, np.ma.MaskedArray]


def _keys_cubic(t: np.ndarray) -> np.ndarray:
    a = -0.5
    t = np.abs(t)
    return np.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )


def _bspline_cubic(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.where(
        t < 1,
        2.0 / 3.0 - t**2 + 0.5 * t**3,
        np.where(t < 2, ((2.0 - t) ** 3) / 6.0, 0.0),
    )


def _lanczos3(t: np.ndarray) -> np.ndarray:
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.sinc(t) * np.sinc(t / 3.0)
    return np.where(np.abs(t) < 3.0, v, 0.0)


# name -> (kernel, tap count, normalize-weights)
_SEPARABLE_KERNELS = {
    "cubic": (_keys_cubic, 4, False),
    "cubic_spline": (_bspline_cubic, 4, False),
    "lanczos": (_lanczos3, 6, True),
}


def prepare_array(
    data,
    masked: bool = True,
    nodata: float = 0,
    dtype: str = "int16",
) -> np.ma.MaskedArray:
    """Normalize input to a 3D (bands, h, w) masked array with given
    dtype/nodata (mapchete/io/raster/array.py:215-306 semantics:
    2D input becomes 1-band, iterables of 2D stack to bands, masks are
    preserved or derived from nodata equality)."""
    if isinstance(data, (list, tuple)):
        data = np.ma.stack(
            [
                m if isinstance(m, np.ma.MaskedArray) else np.ma.masked_equal(m, nodata)
                for m in data
            ]
        )
    if isinstance(data, np.ma.MaskedArray):
        arr = data
    else:
        arr = np.ma.masked_equal(np.asarray(data), nodata)
    if arr.ndim == 2:
        arr = arr[np.newaxis, :, :]
    elif arr.ndim != 3:
        raise ValueError(f"unsupported array shape {arr.shape}")
    arr = arr.astype(dtype, copy=False)
    if not masked:
        return np.ma.MaskedArray(arr.filled(nodata), mask=False)
    arr.set_fill_value(nodata)
    return arr


def bounds_to_ranges(
    array_bounds: Bounds, array_shape: Tuple[int, int], sub_bounds: Bounds
) -> Tuple[int, int, int, int]:
    """(row_min, row_max, col_min, col_max) pixel window of sub_bounds
    inside an array covering array_bounds — floor/ceil rounding like the
    reference (mapchete/io/raster/array.py:195-212 / grid.py:39-54)."""
    h, w = array_shape
    px = array_bounds.width / w
    py = array_bounds.height / h
    col_min = int(np.floor(round((sub_bounds.left - array_bounds.left) / px, 9)))
    col_max = int(np.ceil(round((sub_bounds.right - array_bounds.left) / px, 9)))
    row_min = int(np.floor(round((array_bounds.top - sub_bounds.top) / py, 9)))
    row_max = int(np.ceil(round((array_bounds.top - sub_bounds.bottom) / py, 9)))
    return row_min, row_max, col_min, col_max


def extract_from_array(
    array: ArrayLike, array_bounds: Bounds, out_bounds: Bounds
) -> np.ma.MaskedArray:
    """Crop a sub-window; out_bounds must lie inside array_bounds
    (mapchete/io/raster/array.py:26-81)."""
    arr = prepare_array(array) if array.ndim == 2 else array
    r0, r1, c0, c1 = bounds_to_ranges(array_bounds, arr.shape[-2:], out_bounds)
    if r0 < 0 or c0 < 0 or r1 > arr.shape[-2] or c1 > arr.shape[-1]:
        raise ValueError("extraction bounds outside of array")
    return arr[..., r0:r1, c0:c1]


def resample_from_array(
    array: ArrayLike,
    in_bounds: Bounds,
    out_bounds: Bounds,
    out_shape: Tuple[int, int],
    resampling: str = "nearest",
    nodata: float = 0,
) -> np.ma.MaskedArray:
    """Resample a (bands, h, w) array onto a target grid.

    nearest: index lookup at target pixel centers (exact for any ratio);
    average: box mean (exact for integer downscale factors, pixel-center
    sampling otherwise); bilinear: separable interpolation of pixel
    centers. Masked cells propagate (any-contributor for average,
    nearest-source for the others) — mapchete/io/raster/array.py:84-192
    with the GDAL kernels replaced by their exact dyadic equivalents.
    """
    arr = array if array.ndim == 3 else array[np.newaxis]
    if not isinstance(arr, np.ma.MaskedArray):
        arr = np.ma.masked_equal(arr, nodata)
    bands, in_h, in_w = arr.shape
    out_h, out_w = out_shape
    px_in_x = in_bounds.width / in_w
    px_in_y = in_bounds.height / in_h
    px_out_x = out_bounds.width / out_w
    px_out_y = out_bounds.height / out_h

    fx = px_out_x / px_in_x
    fy = px_out_y / px_in_y
    int_down = (
        abs(fx - round(fx)) < 1e-9
        and abs(fy - round(fy)) < 1e-9
        and round(fx) >= 1
        and round(fy) >= 1
        and abs((in_bounds.left - out_bounds.left) % px_in_x) < 1e-9
        and abs((in_bounds.top - out_bounds.top) % px_in_y) < 1e-9
    )

    if resampling in ("average", "max", "min") and int_down:
        kx, ky = int(round(fx)), int(round(fy))
        r0, r1, c0, c1 = bounds_to_ranges(in_bounds, (in_h, in_w), out_bounds)
        # the source may not fully cover the target window (e.g. mosaic
        # of a partial child set): place the overlap into a NaN canvas
        data = np.full((bands, out_h * ky, out_w * kx), np.nan, dtype=np.float64)
        sr0, sc0 = max(r0, 0), max(c0, 0)
        sr1, sc1 = min(r1, in_h), min(c1, in_w)
        if sr1 > sr0 and sc1 > sc0:
            data[:, sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0] = (
                arr[:, sr0:sr1, sc0:sc1].astype(np.float64).filled(np.nan)
            )
        blocks = data.reshape(bands, out_h, ky, out_w, kx)
        reducer = {"average": np.nanmean, "max": np.nanmax, "min": np.nanmin}[
            resampling
        ]
        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            # all-NaN blocks (fully masked / uncovered) are expected and
            # become nodata below
            warnings.simplefilter("ignore", category=RuntimeWarning)
            mean = reducer(blocks, axis=(2, 4))
        mask = np.isnan(mean)
        out = np.ma.MaskedArray(
            np.where(mask, nodata, mean).astype(arr.dtype), mask=mask
        )
        out.set_fill_value(nodata)
        return out

    # pixel-center coordinate arrays of the target grid
    xs = out_bounds.left + (np.arange(out_w) + 0.5) * px_out_x
    ys = out_bounds.top - (np.arange(out_h) + 0.5) * px_out_y
    # fractional source indexes of those centers
    fcols = (xs - in_bounds.left) / px_in_x - 0.5
    frows = (in_bounds.top - ys) / px_in_y - 0.5

    if resampling == "bilinear":
        c0 = np.clip(np.floor(fcols).astype(int), 0, in_w - 1)
        c1 = np.clip(c0 + 1, 0, in_w - 1)
        r0 = np.clip(np.floor(frows).astype(int), 0, in_h - 1)
        r1 = np.clip(r0 + 1, 0, in_h - 1)
        wx = np.clip(fcols - c0, 0.0, 1.0)
        wy = np.clip(frows - r0, 0.0, 1.0)
        d = arr.astype(np.float64).filled(np.nan)
        top = d[:, r0[:, None], c0] * (1 - wx) + d[:, r0[:, None], c1] * wx
        bot = d[:, r1[:, None], c0] * (1 - wx) + d[:, r1[:, None], c1] * wx
        val = top * (1 - wy[:, None]) + bot * wy[:, None]
        mask = np.isnan(val)
        out = np.ma.MaskedArray(
            np.where(mask, nodata, val).astype(arr.dtype), mask=mask
        )
        out.set_fill_value(nodata)
        return out

    if resampling in _SEPARABLE_KERNELS:
        # separable convolution kernels (the GDAL/rasterio Resampling
        # enum the reference exposes, mapchete/io/raster/array.py:84-192):
        # cubic (Keys a=-0.5, interpolating), cubic_spline (cardinal
        # B-spline, smoothing), lanczos (a=3 windowed sinc, normalized)
        kernel, taps, normalize = _SEPARABLE_KERNELS[resampling]
        offsets = list(range(1 - taps // 2, taps // 2 + 1))
        c0 = np.floor(fcols).astype(int)
        r0 = np.floor(frows).astype(int)
        wx = fcols - c0
        wy = frows - r0
        d = arr.astype(np.float64).filled(np.nan)
        val = np.zeros((bands, out_h, out_w), dtype=np.float64)
        kx = [kernel(wx - o) for o in offsets]
        ky = [kernel(wy - o) for o in offsets]
        if normalize:  # lanczos tap weights don't sum to 1
            sx = np.sum(kx, axis=0)
            sy = np.sum(ky, axis=0)
            kx = [k / sx for k in kx]
            ky = [k / sy for k in ky]
        # edge taps clamp to the border pixel (GDAL-style), which keeps
        # unit-sum kernels exact at the edges too
        for oy, kyv in zip(offsets, ky):
            ri = np.clip(r0 + oy, 0, in_h - 1)
            rowv = np.zeros((bands, out_h, out_w), dtype=np.float64)
            for ox, kxv in zip(offsets, kx):
                ci = np.clip(c0 + ox, 0, in_w - 1)
                rowv += d[:, ri[:, None], ci] * kxv
            val += rowv * kyv[:, None]
        mask = np.isnan(val)
        out = np.ma.MaskedArray(
            np.where(mask, nodata, val).astype(arr.dtype), mask=mask
        )
        out.set_fill_value(nodata)
        return out

    if resampling == "mode" and int_down:
        kx, ky = int(round(fx)), int(round(fy))
        r0, r1, c0, c1 = bounds_to_ranges(in_bounds, (in_h, in_w), out_bounds)
        data = np.full((bands, out_h * ky, out_w * kx), np.nan, dtype=np.float64)
        sr0, sc0 = max(r0, 0), max(c0, 0)
        sr1, sc1 = min(r1, in_h), min(c1, in_w)
        if sr1 > sr0 and sc1 > sc0:
            data[:, sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0] = (
                arr[:, sr0:sr1, sc0:sc1].astype(np.float64).filled(np.nan)
            )
        blocks = (
            data.reshape(bands, out_h, ky, out_w, kx)
            .transpose(0, 1, 3, 2, 4)
            .reshape(bands, out_h, out_w, ky * kx)
        )
        sorted_b = np.sort(blocks, axis=-1)  # NaN sorts last
        # longest run of equal values = the mode (ties -> smallest value)
        n = ky * kx
        best_val = sorted_b[..., 0]
        best_run = np.zeros(best_val.shape, dtype=np.int64)
        run = np.zeros(best_val.shape, dtype=np.int64)
        cur = np.full(best_val.shape, np.nan)
        for i in range(n):
            v = sorted_b[..., i]
            same = (v == cur) & ~np.isnan(v)
            run = np.where(same, run + 1, np.where(np.isnan(v), 0, 1))
            cur = v
            better = run > best_run
            best_run = np.where(better, run, best_run)
            best_val = np.where(better, v, best_val)
        mask = best_run == 0
        out = np.ma.MaskedArray(
            np.where(mask, nodata, best_val).astype(arr.dtype), mask=mask
        )
        out.set_fill_value(nodata)
        return out

    if resampling not in ("nearest", "average", "max", "min", "mode"):
        raise ValueError(f"unsupported resampling: {resampling}")

    # nearest (also the fallback for 'average' on non-integer ratios)
    cols = np.clip(np.round(fcols).astype(int), 0, in_w - 1)
    rows = np.clip(np.round(frows).astype(int), 0, in_h - 1)
    out = arr[:, rows[:, None], cols]
    out.set_fill_value(nodata)
    return out


def rasterize_mask(
    geometries: Iterable[Union[Polygon, MultiPolygon]],
    bounds: Bounds,
    shape: Tuple[int, int],
    invert: bool = False,
    all_touched: bool = False,
) -> np.ndarray:
    """Boolean mask of pixels whose centers fall inside any geometry
    (rasterio.features.geometry_mask replacement, used by
    read_as_raster_mask, vector_file.py:344-390).  ``all_touched``
    additionally marks pixels whose cell rectangle intersects a
    geometry (tested via a positive clip area).  Returns True INSIDE
    geometries when invert=True (geometry_mask convention: default mask
    is True OUTSIDE)."""
    h, w = shape
    px = bounds.width / w
    py = bounds.height / h
    xs = bounds.left + (np.arange(w) + 0.5) * px
    ys = bounds.top - (np.arange(h) + 0.5) * py
    gx, gy = np.meshgrid(xs, ys)
    inside = np.zeros((h, w), dtype=bool)
    for geom in geometries:
        inside |= geom.contains_points(gx.ravel(), gy.ravel()).reshape(h, w)
        if all_touched:
            gb = geom.bounds
            r0, r1, c0, c1 = bounds_to_ranges(bounds, shape, gb.intersection(bounds))
            for r in range(max(r0, 0), min(r1, h)):
                for c in range(max(c0, 0), min(c1, w)):
                    if inside[r, c]:
                        continue
                    cell = Bounds(
                        bounds.left + c * px,
                        bounds.top - (r + 1) * py,
                        bounds.left + (c + 1) * px,
                        bounds.top - r * py,
                    )
                    if geom.intersection_area(cell) > 0:
                        inside[r, c] = True
    return inside if invert else ~inside


def clip_array_with_vector(
    array: ArrayLike,
    bounds: Bounds,
    geometries: Sequence[Union[Polygon, MultiPolygon]],
    inverted: bool = False,
    clip_buffer: float = 0.0,
) -> np.ma.MaskedArray:
    """Mask a raster by vector geometries
    (mapchete/io/raster/array.py:309-377): keep pixels inside the
    geometries (or outside when inverted).  clip_buffer grows each
    geometry's bbox (square-buffer approximation of the reference's
    shapely buffer on deterministic synthetic fixtures)."""
    arr = array if array.ndim == 3 else array[np.newaxis]
    if not isinstance(arr, np.ma.MaskedArray):
        arr = np.ma.MaskedArray(arr, mask=np.zeros_like(arr, dtype=bool))
    geoms = list(geometries)
    if clip_buffer:
        grown = []
        for g in geoms:
            b = g.bounds
            grown.append(
                Polygon.from_bounds(
                    Bounds(
                        b.left - clip_buffer,
                        b.bottom - clip_buffer,
                        b.right + clip_buffer,
                        b.top + clip_buffer,
                    )
                )
            )
        geoms = grown
    mask2d = rasterize_mask(geoms, bounds, arr.shape[-2:], invert=False)
    if inverted:
        mask2d = ~mask2d
    full = np.broadcast_to(mask2d, arr.shape)
    out = np.ma.MaskedArray(arr.data, mask=np.ma.getmaskarray(arr) | full)
    return out


def sample_at_fractional(
    array: ArrayLike,
    frows: np.ndarray,
    fcols: np.ndarray,
    resampling: str = "nearest",
    nodata: float = 0,
) -> np.ma.MaskedArray:
    """Point-wise sampling of a (bands, h, w) array at arbitrary
    FRACTIONAL source indexes (``frows``/``fcols``: equal-shaped
    arrays where integer k addresses the CENTER of pixel k).

    This is the warp-on-read core: resample_from_array's kernels
    assume a separable, axis-aligned target grid, but a REPROJECTED
    tile's pixel centers land on a curved grid in source index space —
    the caller transforms target pixel centers through the CRS pair
    and samples here with the same kernel semantics (nearest /
    bilinear / cubic / cubic_spline / lanczos). The reference gets
    this from GDAL's WarpedVRT (mapchete/io/raster/read.py:324-341).
    Points outside the source coverage ([-0.5, size-0.5] in index
    space) are MASKED — partial overlap is handled by construction.
    """
    arr = array if array.ndim == 3 else array[np.newaxis]
    if not isinstance(arr, np.ma.MaskedArray):
        arr = np.ma.masked_equal(arr, nodata)
    bands, in_h, in_w = arr.shape
    frows = np.asarray(frows, np.float64)
    fcols = np.asarray(fcols, np.float64)
    outside = (
        (frows < -0.5)
        | (frows > in_h - 0.5)
        | (fcols < -0.5)
        | (fcols > in_w - 0.5)
        | ~np.isfinite(frows)
        | ~np.isfinite(fcols)
    )
    fr = np.where(outside, 0.0, frows)
    fc = np.where(outside, 0.0, fcols)
    d = arr.astype(np.float64).filled(np.nan)
    if resampling == "nearest":
        rows = np.clip(np.round(fr).astype(int), 0, in_h - 1)
        cols = np.clip(np.round(fc).astype(int), 0, in_w - 1)
        val = d[:, rows, cols]
    elif resampling == "bilinear":
        r0 = np.clip(np.floor(fr).astype(int), 0, in_h - 1)
        r1 = np.clip(r0 + 1, 0, in_h - 1)
        c0 = np.clip(np.floor(fc).astype(int), 0, in_w - 1)
        c1 = np.clip(c0 + 1, 0, in_w - 1)
        wx = np.clip(fc - c0, 0.0, 1.0)
        wy = np.clip(fr - r0, 0.0, 1.0)
        top = d[:, r0, c0] * (1 - wx) + d[:, r0, c1] * wx
        bot = d[:, r1, c0] * (1 - wx) + d[:, r1, c1] * wx
        val = top * (1 - wy) + bot * wy
    elif resampling in _SEPARABLE_KERNELS:
        kernel, taps, normalize = _SEPARABLE_KERNELS[resampling]
        offsets = list(range(1 - taps // 2, taps // 2 + 1))
        r0 = np.floor(fr).astype(int)
        c0 = np.floor(fc).astype(int)
        wx = fc - c0
        wy = fr - r0
        kx = [kernel(wx - o) for o in offsets]
        ky = [kernel(wy - o) for o in offsets]
        if normalize:  # lanczos tap weights don't sum to 1
            sx = np.sum(kx, axis=0)
            sy = np.sum(ky, axis=0)
            kx = [k / sx for k in kx]
            ky = [k / sy for k in ky]
        val = np.zeros((bands,) + fr.shape, dtype=np.float64)
        # edge taps clamp to the border pixel (GDAL-style), as in
        # resample_from_array
        for oy, kyv in zip(offsets, ky):
            ri = np.clip(r0 + oy, 0, in_h - 1)
            rowv = np.zeros_like(val)
            for ox, kxv in zip(offsets, kx):
                ci = np.clip(c0 + ox, 0, in_w - 1)
                rowv += d[:, ri, ci] * kxv
            val += rowv * kyv
    else:
        raise ValueError(
            f"unsupported resampling for warped reads: {resampling!r} "
            "(supported: nearest, bilinear, cubic, cubic_spline, "
            "lanczos)"
        )
    mask = np.isnan(val) | np.broadcast_to(outside, val.shape)
    out = np.ma.MaskedArray(
        np.where(mask, nodata, val).astype(arr.dtype), mask=mask
    )
    out.set_fill_value(nodata)
    return out
