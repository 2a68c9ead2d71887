"""Stage A -- EXTRACT: vectorized mention detection.

One Arrow-batched pandas UDF pass per corpus row computes every
Python-side feature the pipeline needs (mention windows, estado keyword
features, exact municipality vote counts); everything downstream is
Spark built-ins (explode, broadcast joins, window votes). Presence-test
fields (M1/M2 -- SURVEY.md §2.3) never leave the JVM: they compile to
``regexp_replace`` + ``rlike`` inside whole-stage codegen.

Scale notes: regexes compile once per executor (module import), batches
are Arrow-bounded (session.py caps maxRecordsPerBatch), and the UDF is
a narrow map -- no shuffle until the link stage groups mentions.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import refsem
from .schemas import MENTIONS_ARRAY, MUNI_COUNTS_ARRAY

# ---------------------------------------------------------------- pUDFs

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("mentions", MENTIONS_ARRAY),
        T.StructField("estado_rank", T.IntegerType()),
        T.StructField("estado_digit", T.StringType()),
        T.StructField("muni_counts", MUNI_COUNTS_ARRAY),
        T.StructField("error", T.StringType()),
    ]
)

_EMPTY_EXTRACT = {
    "mentions": [],
    "estado_rank": -1,
    "estado_digit": "",
    "muni_counts": [],
    "error": None,
}


def _extract_one(texto):
    """Per-row fault isolation (SURVEY.md §2.1 S6/T3): a kernel failure
    becomes an `error` value on the row -- it never aborts the job
    (reference precedent: every field fn swallows exceptions,
    extractorAvaluos.py:109-110 etc.)."""
    try:
        rank, digit = refsem.estado_features(texto)
        return {
            "mentions": [
                {"field": f, "anchor_rank": r, "span_start": s, "window": w}
                for f, r, s, w in refsem.avaluo_windows(texto)
            ],
            "estado_rank": rank,
            "estado_digit": digit,
            "muni_counts": [
                {"branch_id": b, "alias_rank": r, "cnt": c}
                for b, r, c in refsem.muni_vote_counts(texto)
            ],
            "error": None,
        }
    except Exception as e:  # noqa: BLE001 -- fault boundary by design
        return dict(_EMPTY_EXTRACT, error=f"{type(e).__name__}: {e}")


@pandas_udf(_EXTRACT_SCHEMA)
def extract_avaluo_udf(texts: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_extract_one(t) for t in texts])


@pandas_udf(T.StringType())
def parse_window_udf(fields: pd.Series, windows: pd.Series) -> pd.Series:
    return pd.Series(
        [refsem.parse_window(f, w) for f, w in zip(fields, windows)], dtype=object
    )


# ------------------------------------------------- JVM-side presence tests


def _presence_regex(anchors: list[str]) -> str:
    # (?iu): Java regex needs UNICODE_CASE for 'ú'~'Ú' folding (Python's
    # re.IGNORECASE folds Unicode by default)
    return "(?iu)(" + "|".join(re.escape(a) for a in anchors) + ")"


def norm_ws_col(col: Column) -> Column:
    """P2 -- whitespace collapse, JVM-side."""
    return F.regexp_replace(col, r"\s+", " ")


def validez_col(text: Column) -> Column:
    """M1 as a pure built-in presence test (extractorAvaluos.py:88-110)."""
    hit = norm_ws_col(text).rlike(_presence_regex(refsem.VALIDEZ_ANCHORS))
    return (
        F.when(text.isNull(), F.lit(""))
        .when(hit, F.lit("SI"))
        .otherwise(F.lit("NO"))
    )


def firma_col(text: Column) -> Column:
    """M2 as a pure built-in presence test (extractorAvaluos.py:112-134)."""
    hit = norm_ws_col(text).rlike(_presence_regex(refsem.FIRMA_ANCHORS))
    return (
        F.when(text.isNull(), F.lit("NINGUNA"))
        .when(hit, F.lit("ELECTRÓNICA"))
        .otherwise(F.lit("FÍSICA"))
    )


def fold_tildes_col(col: Column) -> Column:
    """P1 -- exact accent fold via translate (extractorAvaluos.py:78-86)."""
    return F.translate(col, "ÁÉÍÓÚ", "AEIOU")


# ------------------------------------------------------------ stage entry


def extract_stage(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """docs(id, text, ...) -> extracted features frame.

    Output: id, content_sha (the per-row invariant, F.sha2 --
    BASELINE.json:input_hint), validez, firma, ext struct.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha"),
        validez_col(F.col(text_col)).alias("validez"),
        firma_col(F.col(text_col)).alias("firma"),
        extract_avaluo_udf(F.col(text_col)).alias("ext"),
    )
