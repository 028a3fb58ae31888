"""CSV person-table source with the reference loader's semantics.

Mirrors ``src/loaders/csv_loader.rs``:

* header-hint column-mapping inference (:593-628): exact normalized
  match first, then substring match, hint priority order
* stable content-hash row ids when no id column exists (:642-702):
  FNV-1a 64 over ``header=value\\x1f`` pairs, masked to 63 bits —
  NOT ``monotonically_increasing_id`` (not stable across runs/layout)
* strict %Y-%m-%d birthdate parsing (loader feeds parse_date_strict)
* formula-injection risk flag for cells starting = + - @ (:719-731)

The read itself is ``spark.read.csv`` (distributed, pushdown-capable);
everything here is mapping + projection on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "infer_mapping",
    "load_persons_csv",
    "formula_injection_col",
]

_HINTS: dict[str, tuple[list[str], bool]] = {
    # column -> (hints in priority order, required)
    "id": (["id", "person_id", "beneficiary_id"], True),
    "uuid": (["uuid"], False),
    "first_name": (["first_name", "firstname", "fname", "given_name"], True),
    "middle_name": (["middle_name", "middlename", "mname"], False),
    "last_name": (["last_name", "lastname", "lname", "surname"], True),
    "birthdate": (["birthdate", "birth_date", "birthday", "dob"], True),
    "hh_id": (["hh_id", "household_id"], False),
}


def _norm_header(value: str) -> str:
    """ASCII-alphanumeric filter + lowercase (csv_loader.rs:631-637)."""
    return "".join(
        c.lower() for c in value if c.isascii() and c.isalnum()
    )


def infer_mapping(headers: list[str]) -> dict[str, str | None]:
    """Header-hint inference (csv_loader.rs:593-628): for each target
    column, first an exact normalized-name match over the hint list,
    then a substring match; None when nothing matches (required
    columns may legitimately be absent — id falls back to row hash)."""
    normalized = {_norm_header(h): h for h in headers}
    out: dict[str, str | None] = {}
    for target, (hints, _required) in _HINTS.items():
        found = None
        for hint in hints:
            if _norm_header(hint) in normalized:
                found = normalized[_norm_header(hint)]
                break
        if found is None:
            for hint in hints:
                for h in headers:
                    if _norm_header(hint) in _norm_header(h):
                        found = h
                        break
                if found:
                    break
        out[target] = found
    return out


def _stable_id_udf(headers: list[str]):
    """FNV-1a 64 over ``header=value\\x1f`` pairs in file column order,
    masked to 63 bits (csv_loader.rs:650-667), as an Arrow-batched UDF
    (a byte-level fold over arbitrary UTF-8 is not expressible as a
    Column expression)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def fnv_id(*cols):
        out = []
        n = len(cols[0])
        for i in range(n):
            h = 0xCBF29CE484222325
            for hdr, col in zip(headers, cols):
                for b in hdr.encode("utf-8"):
                    h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                h = ((h ^ 0x3D) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF  # '='
                v = col.iloc[i]
                if v is not None and not (isinstance(v, float) and pd.isna(v)):
                    for b in str(v).encode("utf-8"):
                        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                h = ((h ^ 0x1F) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF  # '\x1f'
            out.append(h & 0x7FFFFFFFFFFFFFFF)
        return pd.Series(out, dtype="int64")

    return fnv_id


def formula_injection_col(c: Column) -> Column:
    """Cell flagged when its first non-leading-whitespace char is one
    of = + - @ (csv_loader.rs:719-731)."""
    first = F.substring(F.ltrim(c), 1, 1)
    return first.isin("=", "+", "-", "@")


def load_persons_csv(
    spark: SparkSession,
    path: str,
    encoding: str = "UTF-8",
    sep: str = ",",
    mapping: dict[str, str | None] | None = None,
) -> DataFrame:
    """Read a person CSV into the engine's person schema.

    Returns columns: id, uuid, first_name, middle_name, last_name,
    birthdate (strict yyyy-MM-dd else NULL), hh_id, plus every
    unmapped source column passed through (the reference's
    extra_fields), plus ``formula_injection_risk`` (boolean).
    """
    if encoding.lower() not in (
        "utf-8", "us-ascii", "iso-8859-1", "utf-16", "utf-16be", "utf-16le", "utf-32"
    ):
        # Spark 4 restricts CSV charsets by default; the reference reads
        # Windows-1252 and friends (csv_loader.rs chardetng detection)
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    raw = spark.read.csv(path, header=True, encoding=encoding, sep=sep)
    headers = raw.columns
    m = mapping or infer_mapping(headers)

    def col_or_null(name: str | None) -> Column:
        return F.col(name) if name else F.lit(None).cast("string")

    if m.get("id"):
        id_col = F.when(
            F.col(m["id"]).isNotNull() & (F.col(m["id"]) != ""),
            F.col(m["id"]).cast("long"),
        ).otherwise(_stable_id_udf(headers)(*[F.col(h) for h in headers]))
    else:
        id_col = _stable_id_udf(headers)(*[F.col(h) for h in headers])

    bd_raw = col_or_null(m.get("birthdate"))
    birthdate = F.when(
        F.length(F.trim(bd_raw)) == 10, F.to_date(F.trim(bd_raw), "yyyy-MM-dd")
    )

    mapped = {v for v in m.values() if v}
    passthrough = [h for h in headers if h not in mapped]
    injection = None
    for h in headers:
        cell = formula_injection_col(F.col(h))
        injection = cell if injection is None else (injection | cell)

    return raw.select(
        id_col.alias("id"),
        col_or_null(m.get("uuid")).alias("uuid"),
        col_or_null(m.get("first_name")).alias("first_name"),
        col_or_null(m.get("middle_name")).alias("middle_name"),
        col_or_null(m.get("last_name")).alias("last_name"),
        birthdate.alias("birthdate"),
        col_or_null(m.get("hh_id")).alias("hh_id"),
        F.coalesce(injection, F.lit(False)).alias("formula_injection_risk"),
        *[F.col(h) for h in passthrough],
    )
