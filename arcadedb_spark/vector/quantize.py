"""Vector quantization — int8 (min-max) and binary (median threshold).

Parity: function/sql/vector/SQLFunctionVectorQuantizeInt8.java (min-max
scaling to [-128,127] with per-vector min/max metadata),
SQLFunctionVectorQuantizeBinary.java (median-threshold bit packing,
LSB-first within each byte), SQLFunctionVectorDequantize{Int8,Binary}.java,
and index/vector/VectorQuantizationType.java (NONE/INT8/BINARY).

All pure Column expressions (codegen; no Python).  Quantized form is a
struct carrying the dequantization metadata, mirroring the reference's
QuantizationResult record.  Note: ``array_min``/``array_max``/median are
referenced inside per-element lambdas, so quantization is O(dim²) per row
— irrelevant at embedding dims (≤ few k), and it keeps the whole thing
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quantize_int8(vec) -> Column:
    """struct(quantized: array<tinyint>, min: double, max: double).

    quantized[i] = round((v−min)/(max−min)·255) − 128; all-equal vectors
    map to 0 (SQLFunctionVectorQuantizeInt8.java:66-91).
    """
    v = _c(vec).cast("array<double>")
    mn, mx = F.array_min(v), F.array_max(v)
    q = F.when(
        mn == mx,
        F.transform(v, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            v,
            lambda x: (
                F.round((x - F.array_min(v)) / (F.array_max(v) - F.array_min(v)) * 255)
                - 128
            ).cast("tinyint"),
        )
    )
    return F.struct(q.alias("quantized"), mn.alias("min"), mx.alias("max"))


def dequantize_int8(quantized) -> Column:
    """Approximate inverse: (q+128)/255·(max−min)+min over the struct
    produced by ``quantize_int8`` (SQLFunctionVectorDequantizeInt8.java)."""
    s = _c(quantized)
    return F.transform(
        s["quantized"],
        lambda b: (b.cast("double") + 128) / 255 * (s["max"] - s["min"]) + s["min"],
    )


def _median(v) -> Column:
    """Arrays.sort middle / mean-of-middles median
    (SQLFunctionVectorQuantizeBinary.java:91-99)."""
    s = F.array_sort(v)
    n = F.size(v)
    half = (n / 2).cast("int")
    return F.when(
        n % 2 == 0,
        (F.try_element_at(s, half) + F.try_element_at(s, half + 1)) / 2.0,
    ).otherwise(F.try_element_at(s, half + 1))


def quantize_binary(vec) -> Column:
    """struct(packed: array<tinyint>, median: double, dims: int).

    bit i = 1 iff v[i] ≥ median, packed LSB-first 8 bits per byte
    (SQLFunctionVectorQuantizeBinary.java:70-86).
    """
    v = _c(vec).cast("array<double>")
    med = _median(v)
    n_bytes = F.ceil(F.size(v) / 8).cast("int")
    byte_idx = F.sequence(F.lit(0), F.greatest(n_bytes - 1, F.lit(0)))

    def _byte(b):
        # LSB-first within the byte, positions past dims contribute 0
        val = F.lit(0)
        for bit in range(8):
            val = val + F.when(
                F.coalesce(
                    F.try_element_at(v, (b * 8 + bit + 1).cast("int")) >= _median(v),
                    F.lit(False),
                ),
                F.lit(1 << bit),
            ).otherwise(0)
        return val

    packed = F.transform(
        byte_idx, lambda b: ((_byte(b) + 128) % 256 - 128).cast("tinyint")
    )
    return F.struct(
        packed.alias("packed"), med.alias("median"), F.size(v).alias("dims")
    )


def binary_hamming(a, b) -> Column:
    """Hamming distance between two ``quantize_binary`` structs
    (BinaryQuantizationResult.hammingDistance)."""
    sa, sb = _c(a), _c(b)
    return F.aggregate(
        F.zip_with(
            sa["packed"],
            sb["packed"],
            lambda x, y: F.bit_count(x.bitwiseXOR(y).cast("int").bitwiseAND(F.lit(255))),
        ),
        F.lit(0),
        lambda acc, c: acc + c,
    )


def dequantize_binary(quantized, low=-1.0, high=1.0) -> Column:
    """Lossy inverse: bit set → ``high`` (default 1.0), clear → ``low``
    (default −1.0) — SQLFunctionVectorDequantizeBinary.java:62-71."""
    s = _c(quantized)
    lo = low if isinstance(low, Column) else F.lit(float(low))
    hi = high if isinstance(high, Column) else F.lit(float(high))
    idx = F.sequence(F.lit(0), F.greatest(s["dims"] - 1, F.lit(0)))
    return F.when(s["dims"] == 0, F.array().cast("array<double>")).otherwise(
        F.transform(
            idx,
            lambda i: F.when(
                F.try_element_at(s["packed"], (i / 8).cast("int") + 1)
                .cast("int")
                .bitwiseAND(F.pow(F.lit(2.0), (i % 8).cast("int")).cast("int"))
                != 0,
                hi,
            ).otherwise(lo),
        )
    )
