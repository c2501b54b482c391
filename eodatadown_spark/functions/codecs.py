"""Encoding/identity scalar functions (C11-C13) + gzipped JSON IO (S9)."""

from __future__ import annotations

import gzip
import json
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def b64_encode(col: Column | str) -> Column:
    """C13: base64 encode (ref eodatadownutils.py:583-592)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(c.cast("binary"))


def b64_decode(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c).cast("string")


def path_uuid5(col: Column | str, namespace: uuid.UUID = uuid.NAMESPACE_URL) -> Column:
    """C11: deterministic uuid5 of a path column (ref
    eodatadownlandsatgoogsensor.py:1209).

    Exact RFC-4122 uuid5 = SHA-1 based; built from Spark's sha1 hex with
    version/variant bit surgery — stays JVM-side, no Python UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    ns_hex = namespace.bytes.hex()
    h = F.sha1(F.concat(F.to_binary(F.lit(ns_hex), F.lit("hex")), c.cast("binary")))
    # uuid5 layout: time_hi version nibble = 5, clock_seq variant bits = 10xx
    variant_nibble = F.conv(
        F.conv(F.substring(h, 17, 1), 16, 10)
        .cast("int")
        .bitwiseAND(F.lit(3))
        .bitwiseOR(F.lit(8))
        .cast("string"),
        10, 16,
    )
    return F.lower(
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.concat(F.lit("5"), F.substring(h, 14, 3)),
            F.concat(variant_nibble, F.substring(h, 18, 3)),
            F.substring(h, 21, 12),
        )
    )


def md5_file(path: str, block_size: int = 4096) -> str:
    """C12: block-wise file checksum (ref eodatadownutils.py:632-658) — used
    inside download task runners, not as a column op."""
    import hashlib

    digest = hashlib.md5()
    with open(path, "rb") as fh:
        for block in iter(lambda: fh.read(block_size), b""):
            digest.update(block)
    return digest.hexdigest()


def read_gzip_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S9: gzipped JSON reader — Spark's JSON source handles the .gz codec
    transparently (ref readGZIPJSON, eodatadownutils.py:662-673)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_gzip_json(obj, path: str) -> None:
    """S9: driver-side gzipped JSON writer (ref writeGZIPJSON,
    eodatadownutils.py:676-687) — config/metadata documents, not tables."""
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(obj, fh)


def json_field(
    col: Column | str, path: str, dtype: str = "string", use_variant: bool = True
) -> Column:
    """C21 typed JSON getter, modern form: Spark 4's native VariantType
    (``parse_json`` → ``try_variant_get``) — the idiomatic engine path for
    the reference's JSONB columns (eodatadownutils.py:688-917 getters).

    Variant parses once into a binary-encoded tree the extractor reads
    directly (no per-access string re-parse, and Parquet can shred variant
    columns for pushdown), unlike ``get_json_object`` which re-scans the
    JSON text per call.  ``use_variant=False`` (or a pre-Variant Spark)
    falls back to the classic getter + cast; both return NULL, never an
    error, on missing paths or type mismatches.
    """
    c = F.col(col) if isinstance(col, str) else col
    if use_variant and hasattr(F, "try_variant_get"):
        parse = getattr(F, "try_parse_json", F.parse_json)  # null, not error
        return F.try_variant_get(parse(c), path, dtype)
    extracted = F.get_json_object(c, path)
    # Column.try_cast is 3.5+; pre-Variant builds older than that get the
    # plain cast (null-on-mismatch under their non-ANSI default)
    cast = getattr(extracted, "try_cast", extracted.cast)
    return cast(dtype)
