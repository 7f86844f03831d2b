"""Ellipsoidal map projections, vectorized numpy — no pyproj in this
environment (the reference delegates all CRS work to pyproj,
/root/reference/pythongis/vector/manager.py:822-846). Formulas are the
public USGS series (Snyder, *Map Projections — A Working Manual*,
PP 1395): Transverse Mercator / UTM (eqs 8-9..8-25) and ellipsoidal
Lambert Azimuthal Equal-Area via authalic latitude (eqs 3-11..3-18,
24-2..24-16). WGS84 ellipsoid. Round-trip accuracy is sub-millimetre
within a UTM zone and ~1e-9 deg for LAEA (verified in tests) — the
same working envelope a GIS user expects from these CRSes.
"""

from __future__ import annotations

import numpy as np

A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2.0 - F)
E = np.sqrt(E2)
EP2 = E2 / (1.0 - E2)
K0 = 0.9996


def utm_zone_lon0(zone: int) -> float:
    """Central meridian (degrees) of a UTM zone (1..60)."""
    return zone * 6.0 - 183.0


def _meridian_arc(phi: np.ndarray) -> np.ndarray:
    e4, e6 = E2 * E2, E2 * E2 * E2
    return A * ((1 - E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
                - (3 * E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
                + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
                - (35 * e6 / 3072) * np.sin(6 * phi))


def utm_forward(lon, lat, zone: int):
    """(lon, lat) degrees → UTM easting/northing (metres) in ``zone``.
    Southern-hemisphere points get the 10,000,000 m false northing."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon)
    lam0 = np.radians(utm_zone_lon0(zone))
    sin_p, cos_p = np.sin(phi), np.cos(phi)
    N = A / np.sqrt(1 - E2 * sin_p * sin_p)
    T = (sin_p / cos_p) ** 2
    C = EP2 * cos_p * cos_p
    Aa = (lam - lam0) * cos_p
    M = _meridian_arc(phi)
    x = K0 * N * (Aa + (1 - T + C) * Aa ** 3 / 6
                  + (5 - 18 * T + T * T + 72 * C - 58 * EP2) * Aa ** 5 / 120) \
        + 500000.0
    y = K0 * (M + N * (sin_p / cos_p)
              * (Aa * Aa / 2 + (5 - T + 9 * C + 4 * C * C) * Aa ** 4 / 24
                 + (61 - 58 * T + T * T + 600 * C - 330 * EP2) * Aa ** 6 / 720))
    y = np.where(lat < 0, y + 10_000_000.0, y)
    return x, y


def utm_inverse(x, y, zone: int, northern=True):
    """UTM easting/northing → (lon, lat) degrees. ``northern`` may be
    a bool or boolean array."""
    x = np.asarray(x, np.float64) - 500000.0
    y = np.asarray(y, np.float64)
    y = np.where(np.asarray(northern, bool), y, y - 10_000_000.0)
    lam0 = np.radians(utm_zone_lon0(zone))
    e1 = (1 - np.sqrt(1 - E2)) / (1 + np.sqrt(1 - E2))
    e4, e6 = E2 * E2, E2 * E2 * E2
    M = y / K0
    mu = M / (A * (1 - E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    phi1 = mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu) \
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu) \
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu) \
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    sin1, cos1 = np.sin(phi1), np.cos(phi1)
    C1 = EP2 * cos1 * cos1
    T1 = (sin1 / cos1) ** 2
    N1 = A / np.sqrt(1 - E2 * sin1 * sin1)
    R1 = A * (1 - E2) / (1 - E2 * sin1 * sin1) ** 1.5
    D = x / (N1 * K0)
    phi = phi1 - (N1 * sin1 / cos1 / R1) * (
        D * D / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * EP2) * D ** 4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * EP2
           - 3 * C1 * C1) * D ** 6 / 720)
    lam = lam0 + (D - (1 + 2 * T1 + C1) * D ** 3 / 6
                  + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * EP2
                     + 24 * T1 * T1) * D ** 5 / 120) / cos1
    return np.degrees(lam), np.degrees(phi)


# ----------------------------------------------- LAEA (authalic form)

def _q_authalic(sin_p: np.ndarray) -> np.ndarray:
    return (1 - E2) * (sin_p / (1 - E2 * sin_p * sin_p)
                       - (1 / (2 * E)) * np.log((1 - E * sin_p)
                                                / (1 + E * sin_p)))


_QP = float(_q_authalic(np.array(1.0)))
_RQ = A * np.sqrt(_QP / 2.0)


def laea_forward(lon, lat, lon0: float, lat0: float):
    """Ellipsoidal Lambert Azimuthal Equal-Area centred (lon0, lat0)
    → (x, y) metres."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam = np.radians(lon - lon0)
    beta = np.arcsin(np.clip(_q_authalic(np.sin(np.radians(lat))) / _QP,
                             -1, 1))
    sin_p0 = np.sin(np.radians(lat0))
    beta1 = np.arcsin(np.clip(float(_q_authalic(np.array(sin_p0))) / _QP,
                              -1, 1))
    m1 = np.cos(np.radians(lat0)) / np.sqrt(1 - E2 * sin_p0 * sin_p0)
    D = A * m1 / (_RQ * np.cos(beta1))
    B = _RQ * np.sqrt(2.0 / (1 + np.sin(beta1) * np.sin(beta)
                             + np.cos(beta1) * np.cos(beta) * np.cos(lam)))
    x = B * D * np.cos(beta) * np.sin(lam)
    y = (B / D) * (np.cos(beta1) * np.sin(beta)
                   - np.sin(beta1) * np.cos(beta) * np.cos(lam))
    return x, y


def laea_inverse(x, y, lon0: float, lat0: float):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    sin_p0 = np.sin(np.radians(lat0))
    beta1 = np.arcsin(np.clip(float(_q_authalic(np.array(sin_p0))) / _QP,
                              -1, 1))
    m1 = np.cos(np.radians(lat0)) / np.sqrt(1 - E2 * sin_p0 * sin_p0)
    D = A * m1 / (_RQ * np.cos(beta1))
    rho = np.sqrt((x / D) ** 2 + (D * y) ** 2)
    with np.errstate(invalid="ignore", divide="ignore"):
        ce = 2 * np.arcsin(np.clip(rho / (2 * _RQ), -1, 1))
        q = _QP * (np.cos(ce) * np.sin(beta1)
                   + D * y * np.sin(ce) * np.cos(beta1) / rho)
    q = np.where(rho == 0, _QP * np.sin(beta1), q)
    lam = np.arctan2(x * np.sin(ce),
                     D * rho * np.cos(beta1) * np.cos(ce)
                     - D * D * y * np.sin(beta1) * np.sin(ce))
    lam = np.where(rho == 0, 0.0, lam)
    # latitude from authalic q by Newton iteration (Snyder 3-16)
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(8):
        sin_p = np.sin(phi)
        cos_p = np.cos(phi)
        denom = 1 - E2 * sin_p * sin_p
        # dq/dphi = 2(1−e²)cosφ / (1−e²sin²φ)²
        dq = 2 * (1 - E2) * cos_p / (denom * denom)
        phi = phi + np.where(cos_p == 0, 0.0,
                             (q - _q_authalic(sin_p)) / np.where(dq == 0, 1,
                                                                 dq))
    return lon0 + np.degrees(lam), np.degrees(phi)


def _phi_from_q(q: np.ndarray) -> np.ndarray:
    """Authalic q → geodetic latitude (radians) by Newton iteration
    (Snyder eq 3-16)."""
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(8):
        sin_p = np.sin(phi)
        cos_p = np.cos(phi)
        denom = 1 - E2 * sin_p * sin_p
        dq = 2 * (1 - E2) * cos_p / (denom * denom)
        phi = phi + np.where(cos_p == 0, 0.0,
                             (q - _q_authalic(sin_p))
                             / np.where(dq == 0, 1, dq))
    return phi


def _m_snyder(phi: np.ndarray) -> np.ndarray:
    """Snyder eq 14-15: m = cos(phi)/sqrt(1 - e^2 sin^2 phi)."""
    sin_p = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - E2 * sin_p * sin_p)


def _albers_consts(lat0: float, lat1: float, lat2: float):
    p0, p1, p2 = (np.radians(v) for v in (lat0, lat1, lat2))
    m1, m2 = float(_m_snyder(np.array(p1))), float(_m_snyder(np.array(p2)))
    q0 = float(_q_authalic(np.sin(np.array(p0))))
    q1 = float(_q_authalic(np.sin(np.array(p1))))
    q2 = float(_q_authalic(np.sin(np.array(p2))))
    if abs(lat1 - lat2) < 1e-12:               # single-parallel cone
        n = float(np.sin(p1))
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)    # Snyder 14-14
    C = m1 * m1 + n * q1                       # 14-13
    rho0 = A * np.sqrt(max(C - n * q0, 0.0)) / n   # 14-12a
    return n, C, rho0


def albers_forward(lon, lat, lon0: float, lat0: float,
                   lat1: float, lat2: float):
    """Ellipsoidal Albers Equal-Area Conic (Snyder PP1395 eqs
    14-12..14-16, authalic q): (lon, lat) degrees → metres."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    n, C, rho0 = _albers_consts(lat0, lat1, lat2)
    q = _q_authalic(np.sin(np.radians(lat)))
    rho = A * np.sqrt(np.maximum(C - n * q, 0.0)) / n
    theta = n * np.radians(lon - lon0)
    return rho * np.sin(theta), rho0 - rho * np.cos(theta)


def albers_inverse(x, y, lon0: float, lat0: float,
                   lat1: float, lat2: float):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, C, rho0 = _albers_consts(lat0, lat1, lat2)
    rho = np.sqrt(x * x + (rho0 - y) ** 2)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    q = (C - (rho * n / A) ** 2) / n           # Snyder 14-19
    phi = _phi_from_q(q)
    return lon0 + np.degrees(theta / n), np.degrees(phi)


def _t_snyder(phi: np.ndarray) -> np.ndarray:
    """Snyder eq 15-9: conformal t."""
    sin_p = np.sin(phi)
    return (np.tan(np.pi / 4 - phi / 2)
            / ((1 - E * sin_p) / (1 + E * sin_p)) ** (E / 2))


def _lcc_consts(lat0: float, lat1: float, lat2: float):
    p0, p1, p2 = (np.radians(v) for v in (lat0, lat1, lat2))
    m1, m2 = float(_m_snyder(np.array(p1))), float(_m_snyder(np.array(p2)))
    t0 = float(_t_snyder(np.array(p0)))
    t1 = float(_t_snyder(np.array(p1)))
    t2 = float(_t_snyder(np.array(p2)))
    if abs(lat1 - lat2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = np.log(m1 / m2) / np.log(t1 / t2)  # Snyder 15-8
    F = m1 / (n * t1 ** n)                     # 15-10
    rho0 = A * F * t0 ** n                     # 15-7a
    return n, F, rho0


def lcc_forward(lon, lat, lon0: float, lat0: float,
                lat1: float, lat2: float):
    """Ellipsoidal Lambert Conformal Conic, 2 standard parallels
    (Snyder PP1395 eqs 15-1..15-10): (lon, lat) degrees → metres."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    n, F, rho0 = _lcc_consts(lat0, lat1, lat2)
    t = _t_snyder(np.radians(lat))
    rho = A * F * t ** n
    theta = n * np.radians(lon - lon0)
    return rho * np.sin(theta), rho0 - rho * np.cos(theta)


def lcc_inverse(x, y, lon0: float, lat0: float,
                lat1: float, lat2: float):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, F, rho0 = _lcc_consts(lat0, lat1, lat2)
    rho = np.sign(n) * np.sqrt(x * x + (rho0 - y) ** 2)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    t = (rho / (A * F)) ** (1.0 / n)
    # Snyder 7-9 / 15-3 iteration: phi from conformal t
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        sin_p = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - E * sin_p) / (1 + E * sin_p)) ** (E / 2))
    return lon0 + np.degrees(theta / n), np.degrees(phi)


# ------------------------------------------ Mollweide (authalic form)

_SQRT2 = np.sqrt(2.0)


def _moll_theta(beta: np.ndarray) -> np.ndarray:
    """Solve Mollweide's transcendental 2θ + sin 2θ = π sin β
    (Snyder eq 31-2..31-3) by guarded Newton; θ pinned exactly at the
    poles where the derivative vanishes."""
    beta = np.asarray(beta, np.float64)
    target = np.pi * np.sin(beta)
    theta = beta.copy()
    for _ in range(25):
        f = 2 * theta + np.sin(2 * theta) - target
        df = 2 + 2 * np.cos(2 * theta)
        step = np.where(df > 1e-12, f / np.where(df == 0, 1.0, df), 0.0)
        theta = theta - step
    pole = np.abs(beta) >= np.pi / 2 - 1e-12
    return np.where(pole, np.sign(beta) * np.pi / 2, theta)


def moll_forward(lon, lat, lon0: float = 0.0):
    """Ellipsoidal Mollweide (the equal-area pseudocylindrical world
    projection) via the authalic sphere: geodetic latitude → authalic
    β (Snyder eq 3-11/3-12), then the spherical Mollweide on radius
    R_q = A·sqrt(q_p/2) — the same authalic-form construction proj
    uses for ellipsoids. x = R·(2√2/π)·Δλ·cosθ, y = R·√2·sinθ."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam = np.radians(lon - lon0)
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    beta = np.arcsin(np.clip(_q_authalic(np.sin(np.radians(lat))) / _QP,
                             -1, 1))
    theta = _moll_theta(beta)
    # pin on the INPUT latitude: arcsin loses ~1e-8 rad near ±1, so a
    # true pole would otherwise land metres off the map apex
    pole = np.abs(lat) >= 90.0 - 1e-12
    theta = np.where(pole, np.sign(lat) * np.pi / 2, theta)
    x = _RQ * (2 * _SQRT2 / np.pi) * lam * np.cos(theta)
    y = _RQ * _SQRT2 * np.sin(theta)
    return x, y


def moll_inverse(x, y, lon0: float = 0.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    theta = np.arcsin(np.clip(y / (_RQ * _SQRT2), -1, 1))
    beta = np.arcsin(np.clip((2 * theta + np.sin(2 * theta)) / np.pi,
                             -1, 1))
    cos_t = np.cos(theta)
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = np.pi * x / (2 * _SQRT2 * _RQ * cos_t)
    lam = np.where(cos_t == 0, 0.0, lam)     # poles: λ undefined → λ0
    phi = _phi_from_beta_series(beta)
    return lon0 + np.degrees(lam), np.degrees(phi)


def _phi_from_beta_series(beta: np.ndarray) -> np.ndarray:
    """Authalic → geodetic latitude by the closed series (Snyder eq
    3-18) — unlike the Newton recovery it stays exact at the poles
    (every correction term carries sin 2kβ)."""
    e4 = E2 * E2
    e6 = e4 * E2
    return (beta
            + (E2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
            + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
            + (761 * e6 / 45360) * np.sin(6 * beta))


# ---------------------------------------- Robinson (table projection)

# Robinson's published 5-degree interpolation table (Robinson 1974,
# "A New Map Projection"; the same PLEN/PDFE node values proj's robin
# uses). X scales parallel length, Y scales distance from the equator.
_ROB_LAT = np.arange(0.0, 95.0, 5.0)
_ROB_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
    0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
    0.6213, 0.5722, 0.5322])
_ROB_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
    0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
    0.9394, 0.9761, 1.0000])
_ROB_FXC = 0.8487          # x = FXC * R * X(lat) * lambda
_ROB_FYC = 1.3523          # y = FYC * R * Y(lat) * sign(lat)


def _nat_cubic_m(y: np.ndarray, h: float) -> np.ndarray:
    """Second derivatives of the natural cubic spline through equally
    spaced nodes (Thomas tridiagonal solve of M[i-1]+4M[i]+M[i+1] =
    6(y[i-1]-2y[i]+y[i+1])/h^2; M[0]=M[-1]=0)."""
    n = len(y)
    rhs = np.zeros(n)
    rhs[1:-1] = 6.0 * (y[:-2] - 2 * y[1:-1] + y[2:]) / (h * h)
    diag = np.full(n, 4.0)
    diag[0] = diag[-1] = 1.0
    upper = np.ones(n - 1)
    upper[0] = 0.0
    lower = np.ones(n - 1)
    lower[-1] = 0.0
    # forward elimination
    for i in range(1, n):
        w = lower[i - 1] / diag[i - 1]
        diag[i] -= w * upper[i - 1]
        rhs[i] -= w * rhs[i - 1]
    m = np.zeros(n)
    m[-1] = rhs[-1] / diag[-1]
    for i in range(n - 2, -1, -1):
        m[i] = (rhs[i] - upper[i] * m[i + 1]) / diag[i]
    return m


_ROB_MX = _nat_cubic_m(_ROB_X, 5.0)
_ROB_MY = _nat_cubic_m(_ROB_Y, 5.0)


def _rob_spline(vals: np.ndarray, m: np.ndarray,
                lat_abs: np.ndarray) -> np.ndarray:
    """Evaluate the natural cubic spline at |lat| in [0, 90]."""
    h = 5.0
    i = np.clip((lat_abs // h).astype(np.int64), 0, len(vals) - 2)
    a = lat_abs - _ROB_LAT[i]
    b = h - a
    return (m[i] * b ** 3 + m[i + 1] * a ** 3) / (6 * h) \
        + (vals[i] / h - m[i] * h / 6) * b \
        + (vals[i + 1] / h - m[i + 1] * h / 6) * a


def robin_forward(lon, lat, lon0: float = 0.0):
    """Robinson pseudocylindrical world projection (the reference's
    +proj=robin demo, tests/test_render_projections.py:77): x/y from
    the published 5-degree table, natural-cubic-spline interpolated,
    on the sphere of radius A. Neither equal-area nor conformal by
    design; the pole line is 0.5322x the equator."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam = np.radians(lon - lon0)
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    la = np.clip(np.abs(lat), 0.0, 90.0)
    x = _ROB_FXC * A * _rob_spline(_ROB_X, _ROB_MX, la) * lam
    y = _ROB_FYC * A * _rob_spline(_ROB_Y, _ROB_MY, la) * np.sign(lat)
    return x, y


def robin_inverse(x, y, lon0: float = 0.0):
    """Inverse Robinson: |lat| from Y by vectorized bisection on the
    monotone spline (60 halvings ~ 1e-16 deg), lambda from X(lat)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    yy = np.clip(np.abs(y) / (_ROB_FYC * A), 0.0, 1.0)
    lo = np.zeros_like(yy)
    hi = np.full_like(yy, 90.0)
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        below = _rob_spline(_ROB_Y, _ROB_MY, mid) < yy
        lo = np.where(below, mid, lo)
        hi = np.where(below, hi, mid)
    la = 0.5 * (lo + hi)
    lat = la * np.sign(y)
    lam = x / (_ROB_FXC * A * _rob_spline(_ROB_X, _ROB_MX, la))
    return lon0 + np.degrees(lam), lat


# -------------------------------------------- proj4-token CRS aliases

_PROJ4_DIR = {"merc": "webmercator", "webmerc": "webmercator",
              "utm": "utm", "laea": "laea", "aea": "albers",
              "lcc": "lcc", "moll": "moll", "robin": "robin"}


def parse_proj4(s: str) -> dict:
    """Parse the proj4 tokens the reference uses as CRS currency
    (reference delegates to pyproj; '+proj=robin' etc. appear in its
    render demos). Returns {'proj': <engine name>, 'inverse': bool,
    and any of zone/lon0/lat0/lat1/lat2}. Unknown +proj values raise
    ValueError listing the supported set."""
    out: dict = {"inverse": False}
    key_map = {"zone": ("zone", int), "lon_0": ("lon0", float),
               "lat_0": ("lat0", float), "lat_1": ("lat1", float),
               "lat_2": ("lat2", float)}
    for tok in s.split():
        tok = tok.lstrip("+")
        if tok == "inv":
            out["inverse"] = True
            continue
        if "=" not in tok:
            continue
        k, v = tok.split("=", 1)
        if k == "proj":
            if v not in _PROJ4_DIR:
                raise ValueError(
                    f"unsupported +proj={v}; supported: "
                    f"{sorted(_PROJ4_DIR)} (arbitrary-EPSG needs "
                    "pyproj, absent in this environment)")
            out["proj"] = _PROJ4_DIR[v]
        elif k in key_map:
            name, cast = key_map[k]
            out[name] = cast(v)
    if "proj" not in out:
        raise ValueError(f"no +proj= token in {s!r}")
    return out
