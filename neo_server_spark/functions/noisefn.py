"""Exact OpenSimplex noise (2D), matching the reference bit-for-bit.

The reference embeds Kurt Spencer's public-domain OpenSimplex algorithm
(mods/nums/opensimplex/{generator.go,base.go,constatns.go} — "Vanilla
opensimplex implementation, matching Kurt Spencer's Java reference
implementation as exactly as possible").  TQL's ``simplex(seed, x[, y])``
(fm_fake.go:521-538) maps 1 coordinate to ``Eval2(x, x)`` and 2 to
``Eval2(x, y)``.

This module is a numpy-vectorized Eval2 of that public-domain algorithm:
the same LCG seed scramble (3 warm-up steps + Fisher-Yates over 256
entries), the same octagon gradient set, stretch/squish constants, and
the /47 normalization — so every reference golden that calls simplex()
(TestLoader_simplex.tql, the TestHistogram/TestBoxplot batteries,
TestTql MAP_LOWPASS) reproduces byte-for-byte.

3+ dimensional Eval (gradients3D/4D) is not used by any reference test
or .tql script; ``eval2`` is the full TQL-visible surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_STRETCH_2D = -0.211324865405187   # (1/sqrt(2+1)-1)/2
_SQUISH_2D = 0.366025403784439     # (sqrt(2+1)-1)/2
_NORM_2D = 47.0

# Octagon gradient directions (base.go gradients2D).
_GRADIENTS_2D = np.array(
    [5, 2, 2, 5, -5, 2, -2, 5, 5, -2, 2, -5, -5, -2, -2, -5],
    dtype=np.float64)

_U64 = (1 << 64) - 1


def _lcg(state: int) -> int:
    """The 64-bit LCG step (generator.go New), with Go int64 wraparound."""
    return (state * 6364136223846793005 + 1442695040888963407) & _U64


class OpenSimplex:
    """Seeded 2D OpenSimplex generator with numpy-vectorized evaluation."""

    def __init__(self, seed: int):
        source = list(range(256))
        perm = [0] * 256
        s = int(seed) & _U64
        for _ in range(3):
            s = _lcg(s)
        for i in range(255, -1, -1):
            s = _lcg(s)
            # Go: r := int32((seed+31) % int64(i+1)); if r < 0 { r += i+1 }
            # == Python floored modulo on the signed 64-bit value.
            signed = s + 31
            if signed >= 1 << 63:
                signed -= 1 << 64
            r = signed % (i + 1)
            perm[i] = source[r]
            source[r] = source[i]
        self._perm = np.array(perm, dtype=np.int64)

    def _extrapolate2(self, xsb, ysb, dx, dy):
        p = self._perm
        index = p[(p[xsb & 0xFF] + ysb) & 0xFF] & 0x0E
        g = _GRADIENTS_2D
        return g[index] * dx + g[index + 1] * dy

    def eval2(self, x, y):
        """Vectorized Eval2; accepts scalars or arrays, returns ndarray."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        sq = _SQUISH_2D

        stretch_offset = (x + y) * _STRETCH_2D
        xs = x + stretch_offset
        ys = y + stretch_offset
        xsb = np.floor(xs).astype(np.int64)
        ysb = np.floor(ys).astype(np.int64)
        squish_offset = (xsb + ysb).astype(np.float64) * sq
        xb = xsb + squish_offset
        yb = ysb + squish_offset
        xins = xs - xsb
        yins = ys - ysb
        in_sum = xins + yins
        dx0 = x - xb
        dy0 = y - yb

        value = np.zeros(np.broadcast(x, y).shape, dtype=np.float64)

        def contribute(attn, xsv, ysv, dx, dy):
            m = attn > 0
            a = np.where(m, attn, 0.0)
            a *= a
            return np.where(m, a * a * self._extrapolate2(xsv, ysv, dx, dy),
                            0.0)

        # Contribution (1,0)
        dx1 = dx0 - 1 - sq
        dy1 = dy0 - 0 - sq
        value += contribute(2 - dx1 * dx1 - dy1 * dy1, xsb + 1, ysb, dx1, dy1)

        # Contribution (0,1)
        dx2 = dx0 - 0 - sq
        dy2 = dy0 - 1 - sq
        value += contribute(2 - dx2 * dx2 - dy2 * dy2, xsb, ysb + 1, dx2, dy2)

        inside = in_sum <= 1
        zins = np.where(inside, 1 - in_sum, 2 - in_sum)
        xgty = xins > yins

        # Extra-vertex selection, the four cases of base.go Eval2:
        #   inside  & (zins > xins or yins): nearest lattice step out
        #   inside  & else:                  the (1,1) vertex
        #   outside & (zins < xins or yins): two steps along the major axis
        #   outside & else:                  the (0,0) vertex
        in_edge = inside & ((zins > xins) | (zins > yins))
        out_edge = ~inside & ((zins < xins) | (zins < yins))
        conds = [in_edge & xgty, in_edge & ~xgty, inside & ~in_edge,
                 out_edge & xgty, out_edge & ~xgty]
        xsv_ext = np.select(conds,
                            [xsb + 1, xsb - 1, xsb + 1, xsb + 2, xsb],
                            default=xsb)
        ysv_ext = np.select(conds,
                            [ysb - 1, ysb + 1, ysb + 1, ysb, ysb + 2],
                            default=ysb)
        dx_ext = np.select(conds,
                           [dx0 - 1, dx0 + 1, dx0 - 1 - 2 * sq,
                            dx0 - 2 - 2 * sq, dx0 - 2 * sq],
                           default=dx0)
        dy_ext = np.select(conds,
                           [dy0 + 1, dy0 - 1, dy0 - 1 - 2 * sq,
                            dy0 - 2 * sq, dy0 - 2 - 2 * sq],
                           default=dy0)

        # Outside the (0,0) simplex the origin shifts to (1,1).
        xsb = np.where(inside, xsb, xsb + 1)
        ysb = np.where(inside, ysb, ysb + 1)
        dx0 = np.where(inside, dx0, dx0 - 1 - 2 * sq)
        dy0 = np.where(inside, dy0, dy0 - 1 - 2 * sq)

        # Contribution (0,0) or (1,1)
        value += contribute(2 - dx0 * dx0 - dy0 * dy0, xsb, ysb, dx0, dy0)
        # Extra vertex
        value += contribute(2 - dx_ext * dx_ext - dy_ext * dy_ext,
                            xsv_ext, ysv_ext, dx_ext, dy_ext)

        return value / _NORM_2D


_generators: dict[int, OpenSimplex] = {}


def generator(seed: int) -> OpenSimplex:
    """Per-seed generator cache (the reference caches one per node)."""
    g = _generators.get(int(seed))
    if g is None:
        g = _generators[int(seed)] = OpenSimplex(int(seed))
    return g


def simplex(seed: int, x, y=None):
    """TQL simplex(seed, x[, y]) — 1 coord evaluates Eval2(x, x)."""
    g = generator(seed)
    out = g.eval2(x, x if y is None else y)
    return float(out) if out.ndim == 0 else out


def simplex_udf(seed: int, ndim: int):
    """Arrow-batched column form of simplex(seed, ...) for 1 or 2 coords."""
    from pyspark.sql.functions import pandas_udf

    if ndim == 1:
        @pandas_udf("double")
        def _noise1(x: pd.Series) -> pd.Series:
            v = x.to_numpy(dtype="float64")
            return pd.Series(generator(seed).eval2(v, v))
        return _noise1

    @pandas_udf("double")
    def _noise2(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(generator(seed).eval2(
            x.to_numpy(dtype="float64"), y.to_numpy(dtype="float64")))
    return _noise2
