"""Grid Linear / TIN (tin.py) — Delaunay properties + end-to-end."""

import numpy as np

from gdal_spark.tin import barycentric_interp, delaunay, grid_linear


def test_delaunay_empty_circumcircle():
    rng = np.random.RandomState(1)
    px, py = rng.uniform(0, 50, 120), rng.uniform(0, 50, 120)
    tris = delaunay(px, py)
    assert len(tris) > 150  # ~2n - h - 2
    for a, b, c in tris[:40]:
        ax, ay, bx, by, cx, cy = px[a], py[a], px[b], py[b], px[c], py[c]
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
              + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
              + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        d2 = (px - ux) ** 2 + (py - uy) ** 2
        inside = d2 < r2 - 1e-9 * max(r2, 1.0)
        inside[[a, b, c]] = False
        assert not inside.any()


def test_linear_reproduction_and_hull():
    rng = np.random.RandomState(2)
    px, py = rng.uniform(0, 10, 60), rng.uniform(0, 10, 60)
    z = 0.5 * px - 2.0 * py + 7.0
    tris = delaunay(px, py)
    qx = np.array([3.0, 5.0, 50.0])
    qy = np.array([4.0, 6.0, 50.0])
    v = barycentric_interp(tris, px, py, z, qx, qy)
    assert abs(v[0] - (0.5 * 3 - 2 * 4 + 7)) < 1e-10
    assert abs(v[1] - (0.5 * 5 - 2 * 6 + 7)) < 1e-10
    assert np.isnan(v[2])  # outside the hull


def test_grid_linear_spark(spark):
    import pandas as pd

    rng = np.random.RandomState(3)
    n = 80
    pdf = pd.DataFrame({
        "doc_id": np.arange(n),
        "lon": rng.uniform(-170, 170, n),
        "lat": rng.uniform(-80, 80, n),
        "v": rng.uniform(0, 10, n),
    })
    pts = spark.createDataFrame(pdf)
    out = grid_linear(pts, "v", ntx=2, nty=2, tile_px=8).toPandas()
    assert len(out) == 256
    # cross-check a few non-null pixels against the local kernel
    tris = delaunay(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
    got = out.dropna().head(20)
    qx = -180.0 + (got["gx"].to_numpy() + 0.5) * (360.0 / 16)
    qy = 85.0 - (got["gy"].to_numpy() + 0.5) * (170.0 / 16)
    exp = barycentric_interp(tris, pdf["lon"].to_numpy(),
                             pdf["lat"].to_numpy(), pdf["v"].to_numpy(),
                             qx, qy)
    assert np.allclose(got["value"].to_numpy(), exp, atol=1e-9)
