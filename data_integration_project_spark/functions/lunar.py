"""Vietnamese lunisolar calendar, computed astronomically — no lunar
dataset required (the ROADMAP #3 gap: fixed-date Gregorian holidays
were in, Tet was not).

Implements the standard public algorithm for the Vietnamese lunar
calendar (Ho Ngoc Duc's formulation of Jean Meeus' "Astronomical
Algorithms": truncated-series new-moon times and solar longitude,
evaluated at UTC+7): lunar month 11 anchors to the winter solstice,
leap months are the ones without a principal term, and Tet is day 1 of
lunar month 1. Pure driver-side float math over a handful of years —
calendar METADATA, like a holiday dim table, never row-scale work.

The unit tests pin historically documented Tet dates (1995-01-31,
1996-02-19, 1997-02-07, 2000-02-05); the catalog oracle pins the same
public record, so the astronomy is checked against independent facts,
not against itself.
"""

from __future__ import annotations

import math
from datetime import date

_TZ = 7.0  # Vietnam standard time
_DR = math.pi / 180.0


def _int(x: float) -> int:
    return math.floor(x)


def jd_from_date(dd: int, mm: int, yy: int) -> int:
    """Julian day number of a (proleptic) Gregorian calendar date."""
    a = _int((14 - mm) / 12)
    y = yy + 4800 - a
    m = mm + 12 * a - 3
    jd = dd + _int((153 * m + 2) / 5) + 365 * y + _int(y / 4) - _int(y / 100) + _int(y / 400) - 32045
    return jd


def jd_to_date(jd: int) -> date:
    a = jd + 32044
    b = _int((4 * a + 3) / 146097)
    c = a - _int(b * 146097 / 4)
    d = _int((4 * c + 3) / 1461)
    e = c - _int(1461 * d / 4)
    m = _int((5 * e + 2) / 153)
    day = e - _int((153 * m + 2) / 5) + 1
    month = m + 3 - 12 * _int(m / 10)
    year = b * 100 + d - 4800 + _int(m / 10)
    return date(year, month, day)


def _new_moon(k: int) -> float:
    """JD (with fraction) of the k-th new moon after 1900-01-01
    (Meeus truncated series)."""
    t = k / 1236.85
    t2, t3 = t * t, t * t * t
    jd1 = 2415020.75933 + 29.53058868 * k + 0.0001178 * t2 - 0.000000155 * t3
    jd1 += 0.00033 * math.sin((166.56 + 132.87 * t - 0.009173 * t2) * _DR)
    m = 359.2242 + 29.10535608 * k - 0.0000333 * t2 - 0.00000347 * t3
    mpr = 306.0253 + 385.81691806 * k + 0.0107306 * t2 + 0.00001236 * t3
    f = 21.2964 + 390.67050646 * k - 0.0016528 * t2 - 0.00000239 * t3
    c1 = (0.1734 - 0.000393 * t) * math.sin(m * _DR) + 0.0021 * math.sin(2 * _DR * m)
    c1 = c1 - 0.4068 * math.sin(mpr * _DR) + 0.0161 * math.sin(2 * _DR * mpr)
    c1 = c1 - 0.0004 * math.sin(3 * _DR * mpr)
    c1 = c1 + 0.0104 * math.sin(2 * _DR * f) - 0.0051 * math.sin(_DR * (m + mpr))
    c1 = c1 - 0.0074 * math.sin(_DR * (m - mpr)) + 0.0004 * math.sin(_DR * (2 * f + m))
    c1 = c1 - 0.0004 * math.sin(_DR * (2 * f - m)) - 0.0006 * math.sin(_DR * (2 * f + mpr))
    c1 = c1 + 0.0010 * math.sin(_DR * (2 * f - mpr)) + 0.0005 * math.sin(_DR * (2 * mpr + m))
    if t < -11:
        deltat = 0.001 + 0.000839 * t + 0.0002261 * t2 - 0.00000845 * t3 - 0.000000081 * t * t3
    else:
        deltat = -0.000278 + 0.000265 * t + 0.000262 * t2
    return jd1 + c1 - deltat


def _sun_longitude(jdn: float) -> float:
    """Apparent solar ecliptic longitude (radians in [0, 2pi))."""
    t = (jdn - 2451545.0) / 36525.0
    t2 = t * t
    m = 357.52910 + 35999.05030 * t - 0.0001559 * t2 - 0.00000048 * t * t2
    l0 = 280.46645 + 36000.76983 * t + 0.0003032 * t2
    dl = (1.914600 - 0.004817 * t - 0.000014 * t2) * math.sin(_DR * m)
    dl += (0.019993 - 0.000101 * t) * math.sin(2 * _DR * m) + 0.000290 * math.sin(3 * _DR * m)
    lon = (l0 + dl) * _DR
    return lon - 2 * math.pi * _int(lon / (2 * math.pi))


def _new_moon_day(k: int, tz: float = _TZ) -> int:
    return _int(_new_moon(k) + 0.5 + tz / 24.0)


def _sun_longitude_index(day_number: int, tz: float = _TZ) -> int:
    """Which of the 12 major solar terms the given day falls in."""
    return _int(_sun_longitude(day_number - 0.5 - tz / 24.0) / math.pi * 6)


def _lunar_month11(yy: int, tz: float = _TZ) -> int:
    """Day number of the new moon starting lunar month 11 (the month
    containing the winter solstice)."""
    off = jd_from_date(31, 12, yy) - 2415021
    k = _int(off / 29.530588853)
    nm = _new_moon_day(k, tz)
    if _sun_longitude_index(nm, tz) >= 9:
        nm = _new_moon_day(k - 1, tz)
    return nm


def _leap_month_offset(a11: int, tz: float = _TZ) -> int:
    """Offset (in months after month 11) of the leap month: the first
    lunar month containing no principal solar term."""
    k = _int((a11 - 2415021.076998695) / 29.530588853 + 0.5)
    i = 1
    arc = _sun_longitude_index(_new_moon_day(k + i, tz), tz)
    last = 0
    while True:
        last = arc
        i += 1
        arc = _sun_longitude_index(_new_moon_day(k + i, tz), tz)
        if not (arc != last and i < 14):
            break
    return i - 1


def lunar_to_solar(
    lunar_day: int, lunar_month: int, lunar_year: int, lunar_leap: int = 0, tz: float = _TZ
) -> date:
    """Convert a Vietnamese lunar date to the solar (Gregorian) date."""
    if lunar_month < 11:
        a11 = _lunar_month11(lunar_year - 1, tz)
        b11 = _lunar_month11(lunar_year, tz)
    else:
        a11 = _lunar_month11(lunar_year, tz)
        b11 = _lunar_month11(lunar_year + 1, tz)
    k = _int(0.5 + (a11 - 2415021.076998695) / 29.530588853)
    off = lunar_month - 11
    if off < 0:
        off += 12
    if b11 - a11 > 365:
        leap_off = _leap_month_offset(a11, tz)
        leap_month = leap_off - 2
        if leap_month < 0:
            leap_month += 12
        if lunar_leap and lunar_month != leap_month:
            raise ValueError(f"month {lunar_month} is not the leap month")
        if lunar_leap or off >= leap_off:
            off += 1
    return jd_to_date(_new_moon_day(k + off, tz) + lunar_day - 1)


_CAN = ("Giap", "At", "Binh", "Dinh", "Mau", "Ky", "Canh", "Tan", "Nham", "Quy")
_CHI = ("Ty", "Suu", "Dan", "Mao", "Thin", "Ty.", "Ngo", "Mui", "Than", "Dau", "Tuat", "Hoi")


def can_chi_year(lunar_year: int) -> str:
    """Sexagenary (can-chi) name of a lunar year, e.g. 1995 -> At Hoi."""
    return f"{_CAN[(lunar_year + 6) % 10]} {_CHI[(lunar_year + 8) % 12]}"


def tet_dates(year: int, n_days: int = 3) -> list[date]:
    """Solar dates of the Tet public holiday (lunar 1/1 .. 1/n)."""
    first = lunar_to_solar(1, 1, year)
    return [date.fromordinal(first.toordinal() + i) for i in range(n_days)]
