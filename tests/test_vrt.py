"""VRT XML dataset tests — parse, compose, derived bands, LUT/scale
semantics. Reference behavior: frmts/vrt/vrtdataset.cpp (XML model),
vrtsourcedrasterband.cpp (draw-sources-in-order), vrtsources.cpp
(ComplexSource scaling/LUT/NODATA), vrtderivedrasterband.cpp
(PixelFunctionType); format doc gdal.org/drivers/raster/vrt.html."""

import numpy as np
import pytest

from gdal_spark import synth, tiling, vrt
from gdal_spark.geomlite import gdal_checksum
from gdal_spark.synth import tile_pixels_np


def _cks(df):
    rows = tiling.checksum_table(df).collect()
    return {(r.band, r.tile_x, r.tile_y): r.checksum for r in rows}


XML_MOSAIC = """
<VRTDataset rasterXSize="512" rasterYSize="512">
  <SRS>EPSG:3857</SRS>
  <GeoTransform>0.0, 10.0, 0.0, 0.0, 0.0, -10.0</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">
    <SimpleSource>
      <SourceFilename>base</SourceFilename><SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="512" ySize="512"/>
      <DstRect xOff="0" yOff="0" xSize="512" ySize="512"/>
    </SimpleSource>
    <SimpleSource>
      <SourceFilename>patch</SourceFilename><SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="256" ySize="256"/>
      <DstRect xOff="256" yOff="256" xSize="256" ySize="256"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>
"""


def test_parse_model():
    spec = vrt.parse_vrt(XML_MOSAIC)
    assert (spec.xsize, spec.ysize) == (512, 512)
    assert spec.srs == "EPSG:3857"
    assert spec.geotransform == [0.0, 10.0, 0.0, 0.0, 0.0, -10.0]
    [band] = spec.bands
    assert band.dtype == "uint8" and band.band == 1
    assert [s.filename for s in band.sources] == ["base", "patch"]
    assert band.sources[1].dst_rect == (256, 256, 256, 256)


def test_mosaic_priority_and_shift(spark):
    base = synth.tiles_src_df(spark, 2, 2)
    patch = synth.tiles_src_df(spark, 1, 1, raster_id="p", seed=9)
    out = vrt.open_vrt(XML_MOSAIC, {"base": base, "patch": patch})
    got = _cks(out)
    assert len(got) == 4
    # patch lands at tile (1,1) and wins over base there
    assert got[(1, 1, 1)] == gdal_checksum(tile_pixels_np(0, 0, seed=9))
    for t in [(0, 0), (1, 0), (0, 1)]:
        assert got[(1, *t)] == gdal_checksum(tile_pixels_np(*t))
    # dst-frame geotransform from the VRT GeoTransform
    r = {(x.tile_x, x.tile_y): x.geotransform for x in out.collect()}
    assert r[(1, 1)] == [2560.0, 10.0, 0.0, -2560.0, 0.0, -10.0]


def test_complex_scale_and_nodata(spark):
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Float64" band="1">
        <NoDataValue>-1</NoDataValue>
        <ComplexSource>
          <SourceFilename>t</SourceFilename><SourceBand>1</SourceBand>
          <ScaleRatio>2.0</ScaleRatio><ScaleOffset>3.0</ScaleOffset>
          <NODATA>4</NODATA>
        </ComplexSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    t = synth.tiles_src_df(spark, 1, 1)
    [row] = vrt.open_vrt(xml, {"t": t}).collect()
    arr = np.frombuffer(row.data, dtype=np.float64).reshape(256, 256)
    src = tile_pixels_np(0, 0).astype(np.float64)
    exp = np.where(src == 4, -1.0, src * 2.0 + 3.0)
    assert row.nodata == -1.0 and row.dtype == "float64"
    np.testing.assert_allclose(arr, exp)


def test_complex_lut_clamps_and_interpolates(spark):
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Float64" band="1">
        <ComplexSource>
          <SourceFilename>t</SourceFilename>
          <LUT>10:100,20:200,250:0</LUT>
        </ComplexSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    t = synth.tiles_src_df(spark, 1, 1)
    [row] = vrt.open_vrt(xml, {"t": t}).collect()
    arr = np.frombuffer(row.data, dtype=np.float64).reshape(256, 256)
    src = tile_pixels_np(0, 0).astype(np.float64)
    exp = np.interp(src, [10.0, 20.0, 250.0], [100.0, 200.0, 0.0])
    np.testing.assert_allclose(arr, exp)
    # ends clamp: below 10 -> 100, above 250 -> 0 (GDAL LUT semantics)
    assert arr[src < 10].size == 0 or (arr[src < 10] == 100.0).all()


def test_exponent_scaling(spark):
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Float64" band="1">
        <ComplexSource>
          <SourceFilename>t</SourceFilename>
          <Exponent>2.0</Exponent>
          <SrcMin>0</SrcMin><SrcMax>255</SrcMax>
          <DstMin>0</DstMin><DstMax>1</DstMax>
        </ComplexSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    t = synth.tiles_src_df(spark, 1, 1)
    [row] = vrt.open_vrt(xml, {"t": t}).collect()
    arr = np.frombuffer(row.data, dtype=np.float64).reshape(256, 256)
    src = tile_pixels_np(0, 0).astype(np.float64)
    np.testing.assert_allclose(arr, (src / 255.0) ** 2.0)


def test_derived_sum_band(spark):
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Float64" band="1" subClass="VRTDerivedRasterBand">
        <PixelFunctionType>sum</PixelFunctionType>
        <SimpleSource><SourceFilename>a</SourceFilename></SimpleSource>
        <SimpleSource><SourceFilename>b</SourceFilename></SimpleSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    a = synth.tiles_src_df(spark, 1, 1)
    b = synth.tiles_src_df(spark, 1, 1, raster_id="b", seed=9)
    [row] = vrt.open_vrt(xml, {"a": a, "b": b}).collect()
    arr = np.frombuffer(row.data, dtype=np.float64).reshape(256, 256)
    exp = tile_pixels_np(0, 0).astype(np.float64) + \
        tile_pixels_np(0, 0, seed=9).astype(np.float64)
    np.testing.assert_allclose(arr, exp)
    assert row.raster_id == "vrt" and row.band == 1


def test_derived_single_source_sqrt(spark):
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Float32" band="1" subClass="VRTDerivedRasterBand">
        <PixelFunctionType>sqrt</PixelFunctionType>
        <SimpleSource><SourceFilename>t</SourceFilename></SimpleSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    t = synth.tiles_src_df(spark, 1, 1)
    [row] = vrt.open_vrt(xml, {"t": t}).collect()
    arr = np.frombuffer(row.data, dtype=np.float32).reshape(256, 256)
    np.testing.assert_allclose(
        arr, np.sqrt(tile_pixels_np(0, 0).astype(np.float64)).astype(np.float32))


def test_multiband_union(spark):
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Byte" band="1">
        <SimpleSource><SourceFilename>a</SourceFilename></SimpleSource>
      </VRTRasterBand>
      <VRTRasterBand dataType="Byte" band="2">
        <SimpleSource><SourceFilename>b</SourceFilename></SimpleSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    a = synth.tiles_src_df(spark, 1, 1)
    b = synth.tiles_src_df(spark, 1, 1, raster_id="b", seed=9)
    got = _cks(vrt.open_vrt(xml, {"a": a, "b": b}))
    assert got[(1, 0, 0)] == gdal_checksum(tile_pixels_np(0, 0))
    assert got[(2, 0, 0)] == gdal_checksum(tile_pixels_np(0, 0, seed=9))


def test_misaligned_rect_raises(spark):
    xml = XML_MOSAIC.replace('xOff="256" yOff="256"', 'xOff="100" yOff="256"')
    base = synth.tiles_src_df(spark, 2, 2)
    patch = synth.tiles_src_df(spark, 1, 1, raster_id="p", seed=9)
    with pytest.raises(ValueError, match="not aligned"):
        vrt.open_vrt(xml, {"base": base, "patch": patch})


def test_scaled_rect_raises(spark):
    xml = XML_MOSAIC.replace(
        '<DstRect xOff="256" yOff="256" xSize="256" ySize="256"/>',
        '<DstRect xOff="256" yOff="256" xSize="512" ySize="512"/>')
    base = synth.tiles_src_df(spark, 2, 2)
    patch = synth.tiles_src_df(spark, 1, 1, raster_id="p", seed=9)
    with pytest.raises(ValueError, match="scaled"):
        vrt.open_vrt(xml, {"base": base, "patch": patch})


def test_missing_source_raises():
    with pytest.raises(KeyError, match="base"):
        vrt.open_vrt(XML_MOSAIC, {})


def test_xml_roundtrip():
    spec = vrt.parse_vrt(XML_MOSAIC)
    spec2 = vrt.parse_vrt(vrt.build_vrt_xml(spec))
    assert spec2 == spec


def test_byte_cast_simple_source(spark):
    # Float source under a Byte band is cast with GDALCopyWords rounding
    xml = """
    <VRTDataset rasterXSize="256" rasterYSize="256">
      <VRTRasterBand dataType="Byte" band="1">
        <SimpleSource><SourceFilename>t</SourceFilename></SimpleSource>
      </VRTRasterBand>
    </VRTDataset>
    """
    t = synth.tiles_src_df(spark, 1, 1)
    ft = tiling.translate(t, cast_to="float64", scale=(0.998, 0.2))
    [row] = vrt.open_vrt(xml, {"t": ft}).collect()
    assert row.dtype == "uint8"
