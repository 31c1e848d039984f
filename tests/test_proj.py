import numpy as np
import pytest

from icebin_tpu.grid.proj import (PlateCarree, Stereographic, from_proj4,
                                  WGS84_A, WGS84_F)

SEARISE = "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=-39 +ellps=WGS84"
EPSG3031 = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"


def test_proj4_parse_round_trip():
    p = from_proj4(SEARISE)
    assert isinstance(p, Stereographic)
    assert p.lat_ts == 71 and p.lon_0 == -39 and p.lat_0 == 90
    assert (p.a, p.f) == (WGS84_A, WGS84_F)
    p2 = from_proj4(p.to_proj4())
    assert p2 == p


@pytest.mark.parametrize("proj_str", [SEARISE, EPSG3031,
                                      "+proj=stere +lat_0=90 +lat_ts=70 +R=6371000"])
def test_stereographic_round_trip(proj_str):
    p = from_proj4(proj_str)
    rng = np.random.default_rng(0)
    lat0 = 60.0 if p.lat_0 > 0 else -60.0
    lon = rng.uniform(-180, 180, 500)
    lat = lat0 + np.sign(lat0) * rng.uniform(0, 29.9, 500)
    x, y = p.ll2xy(lon, lat)
    lon2, lat2 = p.xy2ll(x, y)
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(dlon, 0.0, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_pole_maps_to_origin():
    p = from_proj4(SEARISE)
    x, y = p.ll2xy(np.array([12.0]), np.array([90.0]))
    np.testing.assert_allclose([x[0], y[0]], [0.0, 0.0], atol=1e-6)


def test_scale_true_at_lat_ts():
    """Numerical scale factor from finite differences == 1 at lat_ts."""
    p = from_proj4(SEARISE)
    lat = 71.0
    eps = 1e-6
    # metric length of eps degrees of latitude on the ellipsoid
    e2 = p.e ** 2
    phi = np.radians(lat)
    M = p.a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5  # meridional radius
    x1, y1 = p.ll2xy(0.0, lat - eps / 2)
    x2, y2 = p.ll2xy(0.0, lat + eps / 2)
    plane = np.hypot(x2 - x1, y2 - y1)
    ground = M * np.radians(eps)
    assert abs(plane / ground - 1.0) < 1e-5
    np.testing.assert_allclose(p.scale_factor(0.0, 71.0), 1.0, atol=1e-9)


def test_scale_factor_area_distortion():
    """k**2 equals the local area distortion (checked by finite differences)."""
    p = from_proj4(SEARISE)
    lon, lat = -45.0, 75.0
    d = 1e-4
    corners_lon = np.array([lon, lon + d, lon + d, lon])
    corners_lat = np.array([lat, lat, lat + d, lat + d])
    x, y = p.ll2xy(corners_lon, corners_lat)
    plane_area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    # Ellipsoidal patch area: M * N cos(phi) dlat dlon
    e2 = p.e ** 2
    phi = np.radians(lat)
    M = p.a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    N = p.a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    ground_area = M * N * np.cos(phi) * np.radians(d) ** 2
    k2 = float(p.scale_factor(lon, lat)) ** 2
    assert abs(plane_area / ground_area / k2 - 1.0) < 1e-3


def test_south_polar():
    p = from_proj4(EPSG3031)
    # South pole at origin; a point due "north" along lon_0.
    x, y = p.ll2xy(np.array([0.0]), np.array([-90.0]))
    np.testing.assert_allclose([x[0], y[0]], [0.0, 0.0], atol=1e-6)
    x, y = p.ll2xy(np.array([0.0, 90.0]), np.array([-71.0, -71.0]))
    # lon=0 should map to +y axis region or -y; just check radii equal & ortho
    r = np.hypot(x, y)
    np.testing.assert_allclose(r[0], r[1], rtol=1e-12)
    np.testing.assert_allclose(x[0] * x[1] + y[0] * y[1], 0.0, atol=1e-3)


def test_plate_carree():
    p = PlateCarree(scale=2.0, lon_0=10.0)
    x, y = p.ll2xy(12.0, 5.0)
    assert (x, y) == (4.0, 10.0)
    lon, lat = p.xy2ll(x, y)
    assert (lon, lat) == (12.0, 5.0)


def test_jax_tracing():
    import jax
    import jax.numpy as jnp
    p = from_proj4(SEARISE)

    @jax.jit
    def f(lon, lat):
        return p.ll2xy(lon, lat)

    x, y = f(jnp.array([-39.0]), jnp.array([80.0]))
    xn, yn = p.ll2xy(np.array([-39.0]), np.array([80.0]))
    np.testing.assert_allclose(np.asarray(x), xn, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y), yn, rtol=1e-12)
