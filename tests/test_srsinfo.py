"""gdalsrsinfo report: distributed string assembly vs known renderings.

Reference: apps/gdalsrsinfo.cpp (-o proj4 / -o wkt output modes).
"""

import pytest

from gdal_spark import srsinfo as SR


@pytest.fixture(scope="module")
def report(spark):
    rows = SR.srsinfo(spark).collect()
    return {r["epsg"]: r for r in rows}


def test_covers_whole_dispatch_table(report):
    from gdal_spark.crs import CONIC_PRESETS

    for code in CONIC_PRESETS:
        if code < 0:            # synthetic proj4-import registrations
            continue
        assert code in report
    for code in (32633, 32733, 26918, 3857):
        assert code in report


def test_lambert93_proj4(report):
    assert report[2154]["proj4"] == (
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
        "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs"
    )


def test_utm_south_flag_and_datum(report):
    p4 = report[32733]["proj4"]
    assert p4 == ("+proj=utm +zone=33 +south +datum=WGS84 "
                  "+units=m +no_defs")
    assert report[26918]["proj4"] == (
        "+proj=utm +zone=18 +datum=NAD83 +units=m +no_defs")


def test_webmerc_special_case(report):
    p4 = report[3857]["proj4"]
    assert p4.startswith("+proj=merc +a=6378137 +b=6378137 ")
    assert "+nadgrids=@null" in p4 and "+wgs84=0,0,0,0,0,0,0" in p4


def test_wkt_structure_and_authority_gate(report):
    w = report[2154]["wkt"]
    assert w.startswith('PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",')
    assert 'PROJECTION["Lambert_Conformal_Conic_2SP"]' in w
    assert 'PARAMETER["standard_parallel_1",49]' in w
    assert w.endswith('UNIT["metre",1],AUTHORITY["EPSG","2154"]]')
    # ESRI codes carry no EPSG authority node
    assert "AUTHORITY" not in report[54009]["wkt"]
    assert 'PROJECTION["Mollweide"]' in report[54009]["wkt"]


def test_hom_everest_custom_ellipsoid(report):
    p4 = report[29873]["proj4"]
    assert "+proj=omerc" in p4 and "+a=6377298.556" in p4
    assert "+rf=300.8017" in p4 and "+ellps" not in p4
