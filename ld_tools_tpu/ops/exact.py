"""Bit-exact host-side LD finisher.

The device fast path (ops/ld_math.py) computes r^2 / D' in f32.  For output
files the framework must *bit-match* the reference, whose per-pair math runs
in Python f64 with a specific operation order and a trailing
``round(x, 4)`` (reference backend/calc_ld.py:50-97).  Haplotype counts are
exact integers on both sides, so bit-matching reduces to replaying the same
IEEE-f64 operations on the host:

  p_ab = c_ab / n                                    (calc_ld.py:33)
  p1 = c1 / n,  q1 = c0_1 / n  (c0 = n - c1 for {0,1} genotypes)
                                                      (calc_ld.py:41-44)
  d = p_ab - p1 * p2                                  (calc_ld.py:50)
  d >= 0: den = min(p1 * q2, q1 * p2)                 (calc_ld.py:64-65)
  d <  0: den = max((-p1) * p2, (-q1) * q2)           (calc_ld.py:71-72)
  den == 0        -> d' = int 0   (ZeroDivisionError) (calc_ld.py:66-76)
  d' == 0         -> r^2 = int 0                      (calc_ld.py:89-90)
  else r^2 = d**2 / (((p1 * q1) * p2) * q2)           (calc_ld.py:87-88)

The int-0 cases matter for formatting parity: the reference emits ``0``
(int) there, but ``0.0`` when a float zero flows through division, and the
writers stringify values verbatim (e.g. ld_area.py:274, ld_triangle.py:357).

Rounding parity: Python's ``round(x, 4)`` performs correct decimal rounding;
numpy's ``np.round`` uses a scaled-multiply shortcut that can differ near
decimal ties.  ``round4`` below is vectorized but defers the rare tie-adjacent
values to Python's round, so it is bit-identical to applying ``round(x, 4)``
elementwise.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class ExactLD:
    """Exact f64 LD values for a block of variant pairs, pre-rounding.

    ``r_square``/``d_prime`` hold the f64 values (0.0 where the reference
    would hold int 0); ``d_prime_is_int_zero`` / ``r_square_is_int_zero``
    mark the entries where the reference produces the *int* 0 sentinel.
    ``p1`` / ``p2`` are the alt-allele frequencies of the row / column
    variants.
    """

    r_square: np.ndarray
    d_prime: np.ndarray
    p1: np.ndarray
    p2: np.ndarray
    d_prime_is_int_zero: np.ndarray
    r_square_is_int_zero: np.ndarray
    _r2_rounded_cache: object = dataclasses.field(
        default=None, repr=False, compare=False
    )
    _dp_rounded_cache: object = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def r_square_rounded(self):
        """round(r^2, 4) with the reference's int-0 sentinel preserved."""
        if self._r2_rounded_cache is None:
            self._r2_rounded_cache = _rounded_object_array(
                self.r_square, self.r_square_is_int_zero
            )
        return self._r2_rounded_cache

    def d_prime_rounded(self):
        if self._dp_rounded_cache is None:
            self._dp_rounded_cache = _rounded_object_array(
                self.d_prime, self.d_prime_is_int_zero
            )
        return self._dp_rounded_cache

    def pair(self, i: int, j: int) -> dict:
        """The reference calc_ld return dict for pair (i, j).

        Matches backend/calc_ld.py:94-97 in both values and types.
        """
        return {
            "r_square": _rounded_scalar(
                self.r_square[i, j], self.r_square_is_int_zero[i, j]
            ),
            "d_prime": _rounded_scalar(
                self.d_prime[i, j], self.d_prime_is_int_zero[i, j]
            ),
            "var_1_alt_freq": round(float(self.p1[i]), 4),
            "var_2_alt_freq": round(float(self.p2[j]), 4),
        }


def exact_ld_from_counts(c_ab, c1, c2, n_haplotypes: int) -> ExactLD:
    """Finish LD in f64 from exact integer counts, reference op order.

    ``c_ab``: (V1, V2) alt+alt co-occurrence counts (any exact dtype);
    ``c1``: (V1,), ``c2``: (V2,) alt counts; ``n_haplotypes``: 2N.
    """
    n = float(n_haplotypes)
    c_ab = np.asarray(c_ab, dtype=np.float64)
    c1 = np.asarray(c1, dtype=np.float64)
    c2 = np.asarray(c2, dtype=np.float64)

    p_ab = c_ab / n
    p1 = (c1 / n)[:, None]
    q1 = ((n - c1) / n)[:, None]
    p2 = (c2 / n)[None, :]
    q2 = ((n - c2) / n)[None, :]

    d = p_ab - p1 * p2
    den_pos = np.minimum(p1 * q2, q1 * p2)
    den_neg = np.maximum((-p1) * p2, (-q1) * q2)
    nonneg = d >= 0
    den = np.where(nonneg, den_pos, den_neg)
    den_zero = den == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        d_prime = np.where(den_zero, 0.0, d / np.where(den_zero, 1.0, den))

    dp_zero = d_prime == 0
    r2_den = ((p1 * q1) * p2) * q2
    with np.errstate(divide="ignore", invalid="ignore"):
        r_square = np.where(
            dp_zero, 0.0, (d * d) / np.where(dp_zero, 1.0, r2_den)
        )
    return ExactLD(
        r_square=r_square,
        d_prime=d_prime,
        p1=c1 / n,
        p2=c2 / n,
        d_prime_is_int_zero=den_zero,
        r_square_is_int_zero=dp_zero,
    )


def exact_ld_elementwise(c_ab, c1, c2, n_haplotypes: int) -> ExactLD:
    """Elementwise (paired) variant of exact_ld_from_counts.

    ``c_ab``, ``c1``, ``c2`` are 1-D arrays of per-PAIR counts (pair k is
    variant-with-count c1[k] vs variant-with-count c2[k]) — used by the
    streamed scan to re-finish threshold hits exactly.  Same f64 op order
    as the outer-product form.
    """
    n = float(n_haplotypes)
    c_ab = np.asarray(c_ab, dtype=np.float64)
    c1 = np.asarray(c1, dtype=np.float64)
    c2 = np.asarray(c2, dtype=np.float64)

    p_ab = c_ab / n
    p1 = c1 / n
    q1 = (n - c1) / n
    p2 = c2 / n
    q2 = (n - c2) / n

    d = p_ab - p1 * p2
    den_pos = np.minimum(p1 * q2, q1 * p2)
    den_neg = np.maximum((-p1) * p2, (-q1) * q2)
    den = np.where(d >= 0, den_pos, den_neg)
    den_zero = den == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        d_prime = np.where(den_zero, 0.0, d / np.where(den_zero, 1.0, den))
    dp_zero = d_prime == 0
    r2_den = ((p1 * q1) * p2) * q2
    with np.errstate(divide="ignore", invalid="ignore"):
        r_square = np.where(
            dp_zero, 0.0, (d * d) / np.where(dp_zero, 1.0, r2_den)
        )
    return ExactLD(
        r_square=r_square,
        d_prime=d_prime,
        p1=p1,
        p2=p2,
        d_prime_is_int_zero=den_zero,
        r_square_is_int_zero=dp_zero,
    )


def format_rounded(values, int_zero=None):
    """Vectorized reference-faithful string formatting of LD values.

    After round(v, 4), every value in [0, 1] is a multiple of 1e-4 and its
    Python str() is the minimal decimal (e.g. '0.8237', '0.5', '1.0');
    int-0 sentinel entries print as '0'.  Returns a list of str.
    """
    values = np.asarray(values, dtype=np.float64)
    m = np.rint(values * 1e4).astype(np.int64)
    out = []
    for k, mk in enumerate(m):
        if int_zero is not None and int_zero.flat[k]:
            out.append("0")
            continue
        whole, frac = divmod(int(mk), 10000)
        s = f"{whole}.{frac:04d}".rstrip("0")
        out.append(s + "0" if s.endswith(".") else s)
    return out


def round4(x: np.ndarray) -> np.ndarray:
    """Vectorized bit-exact equivalent of applying Python round(v, 4).

    Fast path: rint(x * 1e4) / 1e4.  That matches Python's correct decimal
    rounding except possibly where x * 1e4 lands within float error of a
    half-integer tie; those entries (vanishingly rare) are recomputed with
    Python's round.
    """
    x = np.asarray(x, dtype=np.float64)
    y = x * 1e4
    fast = np.rint(y) / 1e4
    frac = y - np.floor(y)
    risky = np.abs(frac - 0.5) < 1e-6
    if np.any(risky):
        idx = np.nonzero(risky)
        vals = x[idx]
        fixed = np.array([round(float(v), 4) for v in vals], dtype=np.float64)
        fast = fast.copy()
        fast[idx] = fixed
    return fast


def _rounded_scalar(value: float, is_int_zero) -> object:
    if is_int_zero:
        return 0
    return round(float(value), 4)


def _rounded_object_array(values: np.ndarray, int_zero: np.ndarray):
    """Object array of round(v, 4) floats with int 0 where flagged."""
    out = round4(values).astype(object)
    out[int_zero] = 0
    return out


def format_ld_value(value) -> str:
    """str() of a reference-style value (int 0 vs float), verbatim.

    The reference writers pass values straight through str() / f-strings
    (ld_area.py:274, ld_triangle.py:201-213, :357), so "0" (monomorphic)
    and "0.0" (float zero) are distinct on disk.
    """
    return str(value)
