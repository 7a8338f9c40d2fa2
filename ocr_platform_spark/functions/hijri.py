"""F3: Hijri ↔ Gregorian year conversion via Julian-day arithmetic.

Same three integer formulas as ref apps/web/src/lib/hijri.ts:3-122 (which
itself follows the classic tabular-Islamic Julian-day conversion). Pure
integer math — also expressible as Spark column expressions; the Python
versions are the tested source of truth.
"""

from __future__ import annotations

import math


def _hijri_to_julian(year: int, month: int, day: int) -> int:
    return (
        (11 * year + 3) // 30
        + 354 * year
        + 30 * month
        - (month - 1) // 2
        + day
        + 1948440
        - 386
    )


def _gregorian_to_julian(year: int, month: int, day: int) -> int:
    if month < 3:
        year -= 1
        month += 12
    a = year // 100
    if year == 1582 and (month > 10 or (month == 10 and day > 4)):
        b = -10
    elif year == 1582 and month == 10:
        b = 0
    elif year < 1583:
        b = 0
    else:
        b = 2 - a + a // 4
    return int(365.25 * (year + 4716)) + int(30.6001 * (month + 1)) + day + b - 1524


def _julian_to_hijri_year(julian_day: int) -> int:
    y = 10631.0 / 30.0
    epoch_astro = 1948084
    shift1 = 8.01 / 60.0
    z = julian_day - epoch_astro
    cyc = math.floor(z / 10631.0)
    z -= 10631 * cyc
    j = math.floor((z - shift1) / y)
    return int(30 * cyc + j)


def _julian_to_gregorian_year(julian_date: int) -> int:
    b = 0
    if julian_date > 2299160:
        a = math.floor((julian_date - 1867216.25) / 36524.25)
        b = 1 + a - a // 4
    bb = julian_date + b + 1524
    cc = math.floor((bb - 122.1) / 365.25)
    dd = math.floor(365.25 * cc)
    ee = math.floor((bb - dd) / 30.6001)
    if ee > 13:
        cc += 1
    return int(cc - 4716)


def gregorian_year_to_hijri_year(gregorian_year: int) -> int:
    """Hijri year containing 1 January of the given Gregorian year."""
    return _julian_to_hijri_year(_gregorian_to_julian(gregorian_year, 1, 1))


def hijri_year_to_gregorian_year(hijri_year: int) -> int:
    """Gregorian year containing 1 Muharram of the given Hijri year."""
    return _julian_to_gregorian_year(_hijri_to_julian(hijri_year, 1, 1))
