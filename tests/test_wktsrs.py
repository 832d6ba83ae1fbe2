"""WKT1 import (gdal_spark/wktsrs.py; reference
ogr/ogrspatialreference.cpp importFromWkt + ogr_srs_esri.cpp
morphFromESRI): closure against the engine's own exportToWkt
(srsinfo.wkt_strings) — re-importing every registered code's WKT
string must reproduce the original projection at sample points."""

import numpy as np
import pytest

from gdal_spark import crs, proj4, wktsrs
from gdal_spark import srsinfo as SR

WKT = SR.wkt_strings()


@pytest.mark.parametrize("code", sorted(
    c for c in WKT if c in crs.CONIC_PRESETS))
def test_reimport_matches_original(code):
    """register_wkt(exportToWkt(code)) == code, value-level."""
    synth = wktsrs.register_wkt(WKT[code])
    kind, _, params = crs.CONIC_PRESETS[code]
    kind2, _, _ = crs.CONIC_PRESETS[synth]
    assert kind2 == kind
    lons, lats = proj4.sample_lonlat(kind, params)
    lons, lats = np.asarray(lons), np.asarray(lats)
    x0, y0 = crs.transform_points_np(code, lons, lats)
    x1, y1 = crs.transform_points_np(synth, lons, lats)
    np.testing.assert_array_equal(x1, x0)
    np.testing.assert_array_equal(y1, y0)


def test_reimport_utm_and_webmerc():
    c = wktsrs.register_wkt(WKT[32733])
    kind, _, params = crs.CONIC_PRESETS[c]
    assert kind == "tmerc" and params["fn"] == 10000000.0
    lons = np.array([14.5, 15.5])
    lats = np.array([-33.0, -35.0])
    # parity with the proj4-import path of the same code
    ref = proj4.register_proj4(SR.proj4_strings()[32733])
    x0, y0 = crs.transform_points_np(ref, lons, lats)
    x1, y1 = crs.transform_points_np(c, lons, lats)
    np.testing.assert_array_equal(x1, x0)
    np.testing.assert_array_equal(y1, y0)

    m = wktsrs.register_wkt(WKT[3857])
    kindm, ellm, _ = crs.CONIC_PRESETS[m]
    assert kindm == "merc" and crs.ELLIPSOIDS[ellm][1] == 0.0
    xs, ys = crs.transform_points_np(m, lons, lats)
    xw, yw = crs.webmerc_forward_np(lons, lats)
    np.testing.assert_allclose(xs, xw, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ys, yw, rtol=0, atol=1e-6)


def test_esri_morphs():
    """ESRI .prj spellings: Lambert_Conformal_Conic (no _2SP suffix),
    Stereographic_South_Pole with Standard_Parallel_1, Mercator."""
    esri_lcc = (
        'PROJCS["NAD_1983_Lambert",GEOGCS["GCS_North_American_1983",'
        'DATUM["D_North_American_1983",SPHEROID["GRS_1980",'
        '6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",-96.0],'
        'PARAMETER["Standard_Parallel_1",33.0],'
        'PARAMETER["Standard_Parallel_2",45.0],'
        'PARAMETER["Latitude_Of_Origin",39.0],'
        'UNIT["Meter",1.0]]')
    c = wktsrs.register_wkt(esri_lcc)
    kind, ellps, p = crs.CONIC_PRESETS[c]
    assert kind == "lcc"
    assert p == dict(phi1=33.0, phi2=45.0, phi0=39.0, lon0=-96.0,
                     fe=0.0, fn=0.0)
    assert crs.ELLIPSOIDS[ellps][0] == 6378137.0

    esri_ps = (
        'PROJCS["South_Pole_Stereo",GEOGCS["GCS_WGS_1984",'
        'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,'
        '298.257223563]],PRIMEM["Greenwich",0.0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Stereographic_South_Pole"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",-71.0],'
        'UNIT["Meter",1.0]]')
    c2 = wktsrs.register_wkt(esri_ps)
    kind2, _, p2 = crs.CONIC_PRESETS[c2]
    assert kind2 == "ps_south" and p2["phi_f"] == -71.0
    # parity with EPSG:3031 (same parameters)
    lons = np.array([10.0, 100.0])
    lats = np.array([-75.0, -80.0])
    x0, y0 = crs.transform_points_np(3031, lons, lats)
    x1, y1 = crs.transform_points_np(c2, lons, lats)
    np.testing.assert_array_equal(x1, x0)
    np.testing.assert_array_equal(y1, y0)


def test_geogcs_and_dispatch_strings():
    assert wktsrs.register_wkt(
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433],'
        'AUTHORITY["EPSG","4326"]]') == 4326
    assert wktsrs.register_srs_string("EPSG:32633") == 32633
    c = wktsrs.register_srs_string(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000"
        " +ellps=GRS80 +units=m +no_defs")
    assert crs.CONIC_PRESETS[c][0] == "laea"
    c2 = wktsrs.register_srs_string(WKT[3035])
    assert crs.CONIC_PRESETS[c2][0] == "laea"


def test_parser_paren_variant_and_escapes():
    n = wktsrs.parse_wkt(
        'PROJCS("a ""b""",GEOGCS("g"),PROJECTION("Sinusoidal"),'
        'PARAMETER("central_meridian",5),UNIT("metre",1))')
    assert n.kw == "PROJCS" and n.vals[0] == 'a "b"'
    assert n.find("PROJECTION").vals[0] == "Sinusoidal"


def test_unsupported_raises():
    with pytest.raises(ValueError, match="unsupported"):
        wktsrs.register_wkt(
            'PROJCS["x",GEOGCS["g",DATUM["d",SPHEROID["s",6378137,'
            '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
            '0.0174532925199433]],PROJECTION["Two_Point_Equidistant"],'
            'PARAMETER["false_easting",0],UNIT["metre",1]]')


def test_wkt_strings_match_jvm_render(spark):
    """wkt_strings() is byte-identical to the srsinfo() DataFrame's
    wkt column (the docstring's promise)."""
    from gdal_spark.srsinfo import srsinfo

    jvm = {r["epsg"]: r["wkt"] for r in srsinfo(spark).collect()}
    drv = SR.wkt_strings()
    assert set(jvm) == set(drv)
    for code in jvm:
        assert jvm[code] == drv[code], code


def test_prj_sidecar_roundtrip(spark, tmp_path):
    """write_shapefile(srs=...) -> read_prj registers an equivalent
    CRS; ogr2ogr(t_srs=<WKT string>) dispatches through it."""
    from gdal_spark import ogr2ogr as OG
    from gdal_spark.shapefile import read_prj, read_shapefile, \
        write_shapefile

    df = spark.createDataFrame(
        [(1, "POINT (14.5 47.2)"), (2, "POINT (15.25 47.9)")],
        "fid long, geom_wkt string")
    base = str(tmp_path / "pts")
    write_shapefile(df, base, srs=3035)
    code = read_prj(base)
    kind, _, params = crs.CONIC_PRESETS[code]
    k0, _, p0 = crs.CONIC_PRESETS[3035]
    assert (kind, params) == (k0, p0)

    back = read_shapefile(spark, base)
    out = OG.ogr2ogr_layer(back, t_srs_epsg=WKT[3035], t_srs_prec=3)
    via_code = OG.ogr2ogr_layer(back, t_srs_epsg=3035, t_srs_prec=3)
    assert sorted(r.geom_wkt for r in out.collect()) == \
        sorted(r.geom_wkt for r in via_code.collect())
