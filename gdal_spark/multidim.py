"""Multidimensional array model — the slicing core of GDAL's multidim
API (gcore/gdalmultidim.cpp:3957 GDALMDArray::GetView with NumPy basic
slicing: integer indexing drops a dimension, start:stop:step ranges,
negative indices count from the end; plus Transpose :4257).

Spark restatement: an MDArray is a DataFrame in COO form — one row per
element with one int64 index column per dimension plus `value`. Views
are LAZY relational algebra: a slice is a filter + affine reindex
((i - start) / step), an integer index is a filter + dimension drop,
a transpose is a column permutation — all pure Column expressions that
Catalyst folds into the scan, so a chain of GetViews reads only the
selected elements (the multidim analog of partition pruning). Chunked
storage maps naturally: persist the COO table partitioned/sorted by
leading index columns and slice filters prune files.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MDArray:
    """dims: list of (name, size); df columns = dim names + 'value'."""

    def __init__(self, df: DataFrame, dims: list[tuple[str, int]]):
        self.df = df
        self.dims = list(dims)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(s for _, s in self.dims)

    def get_view(self, expr: str) -> "MDArray":
        """NumPy basic slicing, e.g. "[1:9:2, ::3, 5]". Integer
        indexing drops the dimension; slices reindex to 0..n-1 like
        GDALSlicedMDArray. Multiple [] groups may be concatenated."""
        df = self.df
        dims = list(self.dims)
        for group in re.findall(r"\[([^\]]*)\]", expr):
            parts = [p.strip() for p in group.split(",")]
            if len(parts) > len(dims):
                raise ValueError(f"view {group!r}: too many indices")
            new_dims: list[tuple[str, int]] = []
            for k, p in enumerate(parts):
                name, size = dims[k]
                col = F.col(name)
                if ":" not in p:  # integer index -> drop the dimension
                    i = int(p)
                    if i < 0:
                        i += size
                    if not (0 <= i < size):
                        raise IndexError(f"{name}[{p}] out of range")
                    df = df.filter(col == i).drop(name)
                    continue
                bits = p.split(":")
                start = int(bits[0]) if bits[0] else 0
                stop = int(bits[1]) if len(bits) > 1 and bits[1] else size
                step = int(bits[2]) if len(bits) > 2 and bits[2] else 1
                if step <= 0:
                    raise ValueError("negative/zero steps unsupported")
                if start < 0:
                    start += size
                if stop < 0:
                    stop += size
                start = max(0, min(start, size))
                stop = max(start, min(stop, size))
                n = (stop - start + step - 1) // step
                df = df.filter(
                    (col >= start) & (col < stop)
                    & (((col - start) % step) == 0)
                ).withColumn(name, ((col - start) / step).cast("long"))
                new_dims.append((name, n))
            new_dims.extend(dims[len(parts):])
            dims = new_dims
        return MDArray(df, dims)

    def transpose(self, order: list[int]) -> "MDArray":
        """GDALMDArray::Transpose (gdalmultidim.cpp:4257): permute the
        dimension order — a pure metadata operation here."""
        if sorted(order) != list(range(len(self.dims))):
            raise ValueError("order must be a permutation of the dims")
        return MDArray(self.df, [self.dims[i] for i in order])

    def unscaled(self, scale: float = 1.0, offset: float = 0.0,
                 nodata: float | None = None) -> "MDArray":
        """GDALMDArray::GetUnscaled (gcore/gdalmultidim.cpp:838 region;
        GDALMDArrayUnscaled): value*scale + offset as double, with the
        raw nodata sentinel mapped to NULL — the COO-relational analog
        of the NaN dstNodata GDAL writes for floating outputs. Pure
        column math; Catalyst folds it into the scan projection."""
        v = F.col("value").cast("double")
        expr = v * F.lit(float(scale)) + F.lit(float(offset))
        if nodata is not None:
            expr = F.when(v == F.lit(float(nodata)),
                          F.lit(None).cast("double")).otherwise(expr)
        return MDArray(self.df.withColumn("value", expr), self.dims)

    def to_rows(self) -> DataFrame:
        """(dim columns in order, value), deterministic column order."""
        return self.df.select(*[n for n, _ in self.dims], "value")


def mdarray_from_fn(spark, dims: list[tuple[str, int]], value_col) -> MDArray:
    """Build a dense COO MDArray from a value expression over the index
    columns (used by fixtures/tests; real data arrives as parquet)."""
    total = 1
    for _, s in dims:
        total *= s
    df = spark.range(0, total, 1)
    stride = total
    for name, size in dims:
        stride //= size
        df = df.withColumn(
            name, ((F.col("id") / stride).cast("long") % size)
        )
    df = df.drop("id").withColumn("value", value_col)
    return MDArray(df, dims)
