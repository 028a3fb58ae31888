"""Driver-contract queries: Spark engine vs DuckDB oracle SQL.

Every entry exercises one operator family from SURVEY.md §2 on the
driver testdata (`/root/testdata/sf*`).  Person tables are DERIVED
deterministically from `part` with dialect-neutral SQL that both
Spark and DuckDB execute identically (names are lowercase ASCII, so
the Unicode normalizers are identity here — their semantics are
covered by pytest parity vectors instead).

Float outputs use floor(x*1e6)/1e6 in BOTH engines (floor is
rounding-mode-free, unlike round()).  All hashing is md5 (portable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Deterministic person derivation (dialect-neutral SQL — runs verbatim
# in Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

PERSONS_A_SQL = """
SELECT
  p_partkey AS id,
  concat('u', lpad(cast(p_partkey % 211 AS STRING), 5, '0')) AS uuid,
  split_part(p_name, ' ', 1) AS first_name,
  CASE WHEN p_partkey % 4 = 0 THEN CAST(NULL AS STRING)
       ELSE split_part(p_name, ' ', 2) END AS middle_name,
  split_part(p_name, ' ', 2) AS last_name,
  make_date(1950 + (p_partkey * 7) % 50,
            1 + (p_partkey * 5) % 12,
            1 + (p_partkey * 3) % 28) AS birthdate,
  CAST(NULL AS STRING) AS hh_id,
  concat('B', lpad(cast(p_partkey % 500 AS STRING), 4, '0')) AS barangay_code,
  concat('C', lpad(cast(p_partkey % 120 AS STRING), 3, '0')) AS city_code
FROM part
"""

PERSONS_B_SQL = """
SELECT
  p_partkey + 1000000 AS id,
  CAST(NULL AS STRING) AS uuid,
  CASE WHEN p_partkey % 5 = 0 THEN concat(split_part(p_name, ' ', 1), 'h')
       ELSE split_part(p_name, ' ', 1) END AS first_name,
  CASE WHEN p_partkey % 3 = 0 THEN CAST(NULL AS STRING)
       ELSE split_part(p_name, ' ', 2) END AS middle_name,
  split_part(p_name, ' ', 2) AS last_name,
  CASE WHEN p_partkey % 7 = 0 AND (1 + (p_partkey * 3) % 28) <= 12
       THEN make_date(1950 + (p_partkey * 7) % 50,
                      1 + (p_partkey * 3) % 28,
                      1 + (p_partkey * 5) % 12)
       ELSE make_date(1950 + (p_partkey * 7) % 50,
                      1 + (p_partkey * 5) % 12,
                      1 + (p_partkey * 3) % 28) END AS birthdate,
  cast(2000 + p_partkey % 211 AS STRING) AS hh_id,
  concat('B', lpad(cast((p_partkey * 3) % 500 AS STRING), 4, '0')) AS barangay_code,
  concat('C', lpad(cast((p_partkey * 3) % 120 AS STRING), 3, '0')) AS city_code
FROM part
"""

_PERSONS_CTE = f"WITH pa AS ({PERSONS_A_SQL}), pb AS ({PERSONS_B_SQL})"


def load_persons(spark: SparkSession, sf_dir: str):
    """Prepared (t1, t2) person DataFrames derived from part."""
    from .operators.persons import prepare_persons

    register_views(spark, sf_dir)
    return (
        prepare_persons(spark.sql(PERSONS_A_SQL)),
        prepare_persons(spark.sql(PERSONS_B_SQL)),
    )


# --- SQL builders -----------------------------------------------------------


def _sx_sql(col: str) -> str:
    """The nonstandard soundex4 as (DuckDB-compatible, RE2-safe) SQL."""
    letters = f"regexp_replace({col}, '[^a-zA-Z]', '', 'g')"
    collapsed = (
        f"translate(lower(substr({letters}, 2, 100000)),"
        f" 'abcdefghijklmnopqrstuvwxyz', '01230120022455012623010202')"
    )
    for d in "123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}', 'g')"
    nozeros = f"regexp_replace({collapsed}, '0', '', 'g')"
    return (
        f"CASE WHEN {letters} = '' THEN '0000' ELSE "
        f"upper(substr({letters}, 1, 1)) || rpad(substr({nozeros}, 1, 3), 3, '0') END"
    )


_F6 = "floor({expr} * 1000000) / 1000000"


def _f6(expr: str) -> str:
    return _F6.format(expr=expr)


_SWAP_B = (
    "(pa.birthdate = CASE WHEN day(pb.birthdate) <= 12 THEN "
    "make_date(year(pb.birthdate), day(pb.birthdate), month(pb.birthdate)) END)"
)


def _bd_cond(allow_swap: bool) -> str:
    base = "pa.birthdate = pb.birthdate"
    return f"({base} OR {_SWAP_B})" if allow_swap else base


# full-name expressions (names already lowercase ascii; normalize_simple
# is identity except the None -> '' double-space quirk)
_FULL_A = "concat(pa.first_name, ' ', coalesce(pa.middle_name, ''), ' ', pa.last_name)"
_FULL_B = "concat(pb.first_name, ' ', coalesce(pb.middle_name, ''), ' ', pb.last_name)"
_FULL_A_NM = "concat(pa.first_name, ' ', pa.last_name)"
_FULL_B_NM = "concat(pb.first_name, ' ', pb.last_name)"


def _lev_pct(a: str, b: str) -> str:
    return (
        f"CASE WHEN greatest(length({a}), length({b})) = 0 THEN 100.0 "
        f"ELSE (1.0 - levenshtein({a}, {b}) * 1.0 / greatest(length({a}), length({b}))) * 100.0 END"
    )


# ---------------------------------------------------------------------------
# Query registry
# ---------------------------------------------------------------------------

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# --- deterministic joins (Algo 1/2) ----------------------------------------


@q(
    "algo1",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id
FROM pa JOIN pb
  ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
 AND pa.birthdate = pb.birthdate
""",
)
def _algo1(spark, sf_dir):
    from .operators.algos import match_algo1

    t1, t2 = load_persons(spark, sf_dir)
    return match_algo1(t1, t2, allow_swap=False).select("t1_id", "t2_id")


@q(
    "algo1_swap",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id
FROM pa JOIN pb
  ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
 AND {_bd_cond(True)}
""",
)
def _algo1_swap(spark, sf_dir):
    from .operators.algos import match_algo1

    t1, t2 = load_persons(spark, sf_dir)
    return match_algo1(t1, t2, allow_swap=True).select("t1_id", "t2_id")


@q(
    "algo2",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id
FROM pa JOIN pb
  ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
 AND pa.birthdate = pb.birthdate
 AND ((pa.middle_name IS NULL AND pb.middle_name IS NULL)
      OR pa.middle_name = pb.middle_name)
""",
)
def _algo2(spark, sf_dir):
    from .operators.algos import match_algo2

    t1, t2 = load_persons(spark, sf_dir)
    return match_algo2(t1, t2, allow_swap=False).select("t1_id", "t2_id")


# --- blocked fuzzy candidates (Algo 3/4 blocking + prefilter) ---------------

_A3_KEYS_B = f"""
SELECT pb.*, year(pb.birthdate) AS yr,
       upper(substr(pb.first_name, 1, 1)) AS fi,
       upper(substr(pb.last_name, 1, 1)) AS li,
       {_sx_sql('pb.last_name')} AS sx,
       {_FULL_B} AS fullname
FROM pb
WHERE pb.first_name IS NOT NULL AND pb.last_name IS NOT NULL
  AND pb.birthdate IS NOT NULL
"""

_A3_KEYS_A = f"""
SELECT pa.*, year(pa.birthdate) AS yr,
       upper(substr(pa.first_name, 1, 1)) AS fi,
       upper(substr(pa.last_name, 1, 1)) AS li,
       {_sx_sql('pa.last_name')} AS sx,
       {_FULL_A} AS fullname
FROM pa
WHERE pa.first_name IS NOT NULL AND pa.last_name IS NOT NULL
  AND pa.birthdate IS NOT NULL
"""


@q(
    "algo3_prefilter",
    f"""{_PERSONS_CTE},
na AS ({_A3_KEYS_A}), nb AS ({_A3_KEYS_B}),
keys2 AS (SELECT DISTINCT yr, fi, li, sx FROM nb),
tier1 AS (
  SELECT na.id a_id, nb.id b_id, na.birthdate a_bd, nb.birthdate b_bd,
         na.fullname f1, nb.fullname f2
  FROM na JOIN nb ON na.yr = nb.yr AND na.fi = nb.fi AND na.li = nb.li AND na.sx = nb.sx
),
m1 AS (SELECT * FROM na WHERE NOT EXISTS (
  SELECT 1 FROM keys2 k WHERE k.yr = na.yr AND k.fi = na.fi AND k.li = na.li AND k.sx = na.sx)),
tier2 AS (
  SELECT m1.id a_id, nb.id b_id, m1.birthdate a_bd, nb.birthdate b_bd,
         m1.fullname f1, nb.fullname f2
  FROM m1 JOIN nb ON nb.yr = m1.yr AND nb.fi = '?' AND nb.li = m1.li AND nb.sx = m1.sx
),
m2 AS (SELECT * FROM m1 WHERE NOT EXISTS (
  SELECT 1 FROM keys2 k WHERE k.yr = m1.yr AND k.fi = '?' AND k.li = m1.li AND k.sx = m1.sx)),
tier3 AS (
  SELECT m2.id a_id, nb.id b_id, m2.birthdate a_bd, nb.birthdate b_bd,
         m2.fullname f1, nb.fullname f2
  FROM m2 JOIN nb ON nb.yr = m2.yr AND nb.fi = m2.fi AND nb.li = m2.li
                 AND nb.sx = substr(m2.sx, 1, 2) || '00'
),
cand AS (SELECT * FROM tier1 UNION ALL SELECT * FROM tier2 UNION ALL SELECT * FROM tier3)
SELECT a_id AS t1_id, b_id AS t2_id,
       {_f6(_lev_pct('f1', 'f2'))} AS lev_pct,
       {_f6('jaro_winkler_similarity(f1, f2) * 100.0')} AS jw_pct
FROM cand
WHERE a_bd = b_bd
  AND greatest({_lev_pct('f1', 'f2')}, jaro_winkler_similarity(f1, f2) * 100.0) >= 84.0
""",
)
def _algo3_prefilter(spark, sf_dir):
    from .functions.udfs import jaro_winkler_udf
    from .operators.algos import _require, match_fuzzy  # noqa: F401
    from .operators.blocking import (
        algo3_block_key,
        algo3_fallback1_key,
        algo3_fallback2_key,
        pair_join,
    )
    from .operators.dates import bd_match_cond
    from .operators.scoring import sim_lev_pct_col

    t1, t2 = load_persons(spark, sf_dir)
    t1 = _require(t1, "first_n", "last_n", "birthdate")
    t2 = _require(t2, "first_n", "last_n", "birthdate")
    t2_keys = t2.select(algo3_block_key().alias("_tk")).distinct()

    tier1 = pair_join(t1, t2, lambda p: [algo3_block_key(p)])
    miss1 = t1.join(t2_keys, on=[algo3_block_key() == F.col("_tk")], how="left_anti")
    tier2 = pair_join(miss1, t2, lambda p: [algo3_fallback1_key(p)], lambda p: [algo3_block_key(p)])
    miss2 = miss1.join(t2_keys, on=[algo3_fallback1_key() == F.col("_tk")], how="left_anti")
    tier3 = pair_join(miss2, t2, lambda p: [algo3_fallback2_key(p)], lambda p: [algo3_block_key(p)])
    cand = tier1.unionByName(tier2).unionByName(tier3)
    cand = cand.filter(bd_match_cond(F.col("t1_birthdate"), F.col("t2_birthdate"), False))
    lev = sim_lev_pct_col(F.col("t1_simple_full"), F.col("t2_simple_full"))
    jw = jaro_winkler_udf(F.col("t1_simple_full"), F.col("t2_simple_full")) * 100.0
    return (
        cand.withColumns({"_lev": lev, "_jw": jw})
        .filter(F.greatest("_lev", "_jw") >= 84.0)
        .select(
            "t1_id",
            "t2_id",
            (F.floor(F.col("_lev") * 1e6) / 1e6).alias("lev_pct"),
            (F.floor(F.col("_jw") * 1e6) / 1e6).alias("jw_pct"),
        )
    )


@q(
    "algo4_prefilter",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id,
       {_f6(_lev_pct(_FULL_A_NM, _FULL_B_NM))} AS lev_pct
FROM pa JOIN pb ON pb.birthdate = pa.birthdate
WHERE pa.birthdate IS NOT NULL AND pb.birthdate IS NOT NULL
  AND greatest({_lev_pct(_FULL_A_NM, _FULL_B_NM)},
               jaro_winkler_similarity({_FULL_A_NM}, {_FULL_B_NM}) * 100.0) >= 84.0
""",
)
def _algo4_prefilter(spark, sf_dir):
    from .functions.udfs import jaro_winkler_udf
    from .operators.blocking import pair_join
    from .operators.scoring import sim_lev_pct_col

    t1, t2 = load_persons(spark, sf_dir)
    t1 = t1.filter(F.col("birthdate").isNotNull())
    t2 = t2.filter(F.col("birthdate").isNotNull())
    pairs = pair_join(t1, t2, lambda p: [F.col(f"{p}bd_str")])
    lev = sim_lev_pct_col(F.col("t1_simple_full_no_mid"), F.col("t2_simple_full_no_mid"))
    jw = jaro_winkler_udf(F.col("t1_simple_full_no_mid"), F.col("t2_simple_full_no_mid")) * 100.0
    return (
        pairs.withColumns({"_lev": lev, "_jw": jw})
        .filter(F.greatest("_lev", "_jw") >= 84.0)
        .select(
            "t1_id", "t2_id", (F.floor(F.col("_lev") * 1e6) / 1e6).alias("lev_pct")
        )
    )


# --- Algo 7: OR-blocked per-field Levenshtein mean --------------------------

_A7_CACHE = """
SELECT p.id, p.birthdate, p.first_name AS af,
       coalesce(p.middle_name, '') AS am, p.last_name AS al,
       substr(p.first_name, 1, 3) AS af3, substr(p.last_name, 1, 3) AS al3,
       {sxf} AS sxf, {sxl} AS sxl,
       CASE WHEN coalesce(p.middle_name, '') = '' THEN NULL ELSE {sxm} END AS sxm
FROM {tbl} p
WHERE p.birthdate IS NOT NULL
"""


@q(
    "algo7",
    f"""{_PERSONS_CTE},
ca AS ({_A7_CACHE.format(tbl='pa', sxf=_sx_sql('p.first_name'), sxl=_sx_sql('p.last_name'), sxm=_sx_sql("coalesce(p.middle_name, '')"))}),
cb AS ({_A7_CACHE.format(tbl='pb', sxf=_sx_sql('p.first_name'), sxl=_sx_sql('p.last_name'), sxm=_sx_sql("coalesce(p.middle_name, '')"))}),
cand AS (
  SELECT ca.id a_id, cb.id b_id FROM ca JOIN cb
    ON ca.birthdate = cb.birthdate AND ca.sxf = cb.sxf AND ca.sxl = cb.sxl
  UNION
  SELECT ca.id, cb.id FROM ca JOIN cb
    ON ca.birthdate = cb.birthdate AND ca.af3 = cb.af3 AND ca.al3 = cb.al3
   AND ca.af3 <> '' AND ca.al3 <> ''
  UNION
  SELECT ca.id, cb.id FROM ca JOIN cb
    ON ca.birthdate = cb.birthdate AND ca.sxm = cb.sxm
)
SELECT c.a_id AS t1_id, c.b_id AS t2_id,
       {_f6("((" + _lev_pct('ca.al', 'cb.al') + ") + (" + _lev_pct('ca.af', 'cb.af') + ") + "
            "CASE WHEN ca.am <> '' AND cb.am <> '' THEN (" + _lev_pct('ca.am', 'cb.am') + ") ELSE 0.0 END) "
            "/ (CASE WHEN ca.am <> '' AND cb.am <> '' THEN 3.0 ELSE 2.0 END) / 100.0")} AS confidence,
       concat(CASE WHEN ca.af = cb.af THEN 'FirstName,' ELSE '' END,
              CASE WHEN ca.am = cb.am THEN 'MiddleName,' ELSE '' END,
              CASE WHEN ca.al = cb.al THEN 'LastName,' ELSE '' END,
              'Birthdate') AS matched
FROM cand c JOIN ca ON ca.id = c.a_id JOIN cb ON cb.id = c.b_id
""",
)
def _algo7(spark, sf_dir):
    from .operators.algos import match_lev_weighted

    t1, t2 = load_persons(spark, sf_dir)
    out = match_lev_weighted(t1, t2)
    return out.select(
        "t1_id",
        "t2_id",
        (F.floor(F.col("confidence") * 1e6) / 1e6).alias("confidence"),
        F.array_join("matched_fields", ",").alias("matched"),
    )


# --- cascade exact levels ----------------------------------------------------


@q(
    "cascade_l1",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id
FROM pa JOIN pb
  ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
 AND pa.middle_name = pb.middle_name AND pa.birthdate = pb.birthdate
WHERE length(replace(trim(pa.middle_name, '.'), ' ', '')) >= 2
  AND length(replace(trim(pb.middle_name, '.'), ' ', '')) >= 2
""",
)
def _cascade_l1(spark, sf_dir):
    from .operators.cascade import match_level

    t1, t2 = load_persons(spark, sf_dir)
    return match_level(t1, t2, 1).select("t1_id", "t2_id")


@q(
    "cascade_l2",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id
FROM pa JOIN pb
  ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
 AND substr(pa.middle_name, 1, 1) = substr(pb.middle_name, 1, 1)
 AND pa.birthdate = pb.birthdate
WHERE pa.middle_name IS NOT NULL AND pb.middle_name IS NOT NULL
""",
)
def _cascade_l2(spark, sf_dir):
    from .operators.cascade import match_level

    t1, t2 = load_persons(spark, sf_dir)
    return match_level(t1, t2, 2).select("t1_id", "t2_id")


@q(
    "cascade_l9",
    f"""{_PERSONS_CTE}
SELECT pa.id AS t1_id, pb.id AS t2_id
FROM pa JOIN pb
  ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
 AND lower(pa.city_code) = lower(pb.city_code)
WHERE pa.city_code IS NOT NULL AND pb.city_code IS NOT NULL
""",
)
def _cascade_l9(spark, sf_dir):
    from .operators.cascade import match_level

    t1, t2 = load_persons(spark, sf_dir)
    return match_level(t1, t2, 9).select("t1_id", "t2_id")


# --- households (over Algo 1 pairs — SQL-exact) ------------------------------


@q(
    "households_opt5",
    f"""{_PERSONS_CTE},
pairs AS (
  SELECT pa.id t1_id, pb.id t2_id, pa.uuid,
         coalesce(pb.hh_id, cast(pb.id AS STRING)) hh_key
  FROM pa JOIN pb
    ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
   AND pa.birthdate = pb.birthdate
  WHERE pa.uuid IS NOT NULL
),
win AS (SELECT *, min(hh_key) OVER (PARTITION BY t1_id) hh_min FROM pairs),
fm AS (SELECT t1_id, min(t2_id) first_min FROM win WHERE hh_key = hh_min GROUP BY t1_id),
tie AS (
  SELECT w.t1_id,
         max(CASE WHEN w.hh_key <> w.hh_min AND w.t2_id > f.first_min THEN 1 ELSE 0 END) t
  FROM win w JOIN fm f ON w.t1_id = f.t1_id GROUP BY w.t1_id),
assigned AS (
  SELECT DISTINCT w.t1_id, w.uuid, w.hh_min FROM win w JOIN tie ON w.t1_id = tie.t1_id
  WHERE tie.t = 0),
matched AS (SELECT uuid, hh_min hh_key, count(*) members FROM assigned GROUP BY uuid, hh_min),
totals AS (SELECT uuid, count(*) total FROM pa WHERE uuid IS NOT NULL GROUP BY uuid),
agg AS (
  SELECT m.uuid, m.hh_key, m.members * 100.0 / t.total AS pct
  FROM matched m JOIN totals t ON m.uuid = t.uuid
  WHERE m.members * 100.0 / t.total > 50.0)
SELECT cast(row_number() OVER (ORDER BY uuid, hh_key) AS BIGINT) row_id, uuid,
       coalesce(try_cast(hh_key AS BIGINT), 0) hh_id,
       {_f6('pct')} AS match_percentage
FROM agg
""",
)
def _households_opt5(spark, sf_dir):
    from .operators.algos import match_algo1
    from .operators.households import household_aggregate

    t1, t2 = load_persons(spark, sf_dir)
    pairs = match_algo1(t1, t2, allow_swap=False)
    out = household_aggregate(pairs, t1, t2, min_conf=0.5, option=5)
    return out.select(
        F.col("row_id").cast("long").alias("row_id"),
        "uuid",
        "hh_id",
        (F.floor(F.col("match_percentage") * 1e6) / 1e6).alias("match_percentage"),
    )


# --- set ops: anti-join exclusion -------------------------------------------


@q(
    "anti_join_unmatched",
    f"""{_PERSONS_CTE},
m AS (
  SELECT DISTINCT pa.id FROM pa JOIN pb
    ON pa.first_name = pb.first_name AND pa.last_name = pb.last_name
   AND pa.birthdate = pb.birthdate)
SELECT pa.id AS t1_id FROM pa WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.id = pa.id)
""",
)
def _anti_join_unmatched(spark, sf_dir):
    from .operators.algos import match_algo1

    t1, t2 = load_persons(spark, sf_dir)
    matched = match_algo1(t1, t2).select(F.col("t1_id").alias("id")).distinct()
    return t1.join(matched, "id", "left_anti").select(F.col("id").alias("t1_id"))


# --- documents: dedup --------------------------------------------------------


@q(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text) HAVING count(*) > 1
""",
)
def _dedup_exact(spark, sf_dir):
    from .operators.dedup import exact_dedup

    register_views(spark, sf_dir)
    return exact_dedup(spark.table("documents"))


@q(
    "dedup_token_jaccard",
    f"""
WITH tok AS (
  SELECT d.doc_id, d.lang, unnest(list_distinct(string_split_regex(lower(d.text), '\\s+'))) AS tok
  FROM documents d),
tok2 AS (SELECT * FROM tok WHERE tok <> ''),
sizes AS (SELECT doc_id, count(*) n FROM tok2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id d1, b.doc_id d2, count(*) c
  FROM tok2 a JOIN tok2 b ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.d1, i.d2, {_f6('i.c * 1.0 / (s1.n + s2.n - i.c)')} AS jaccard
FROM inter i JOIN sizes s1 ON s1.doc_id = i.d1 JOIN sizes s2 ON s2.doc_id = i.d2
WHERE i.c * 1.0 / (s1.n + s2.n - i.c) >= 0.6
""",
)
def _dedup_token_jaccard(spark, sf_dir):
    from .operators.dedup import token_jaccard_pairs

    register_views(spark, sf_dir)
    out = token_jaccard_pairs(spark.table("documents"), threshold=0.6)
    return out.select(
        "d1", "d2", (F.floor(F.col("jaccard") * 1e6) / 1e6).alias("jaccard")
    )


@q(
    "dedup_minhash_lsh",
    """
WITH toks AS (
  SELECT d.doc_id,
         list_filter(string_split_regex(lower(d.text), '\\s+'), x -> x <> '') tl
  FROM documents d),
tok AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(tl) - 2, 0) + 1),
           i -> array_to_string(list_slice(tl, i, i + 2), ' ')))) AS tok
  FROM toks),
tok2 AS (SELECT * FROM tok),
hashed AS (
  SELECT doc_id, i.h_idx, md5(concat(cast(i.h_idx AS STRING), ':', tok)) h
  FROM tok2, (SELECT unnest(range(8)) h_idx) i),
sigs AS (SELECT doc_id, h_idx, min(h) sig FROM hashed GROUP BY doc_id, h_idx),
bands AS (
  SELECT doc_id, cast(floor(h_idx / 2) AS INT) band_id,
         md5(array_to_string(list_sort(list(concat(cast(h_idx AS STRING), '|', sig))), ',')) band_hash
  FROM sigs GROUP BY cast(floor(h_idx / 2) AS INT), doc_id)
SELECT DISTINCT b1.doc_id d1, b2.doc_id d2
FROM bands b1 JOIN bands b2
  ON b1.band_id = b2.band_id AND b1.band_hash = b2.band_hash AND b1.doc_id < b2.doc_id
""",
)
def _dedup_minhash_lsh(spark, sf_dir):
    from .operators.dedup import minhash_lsh_candidates

    register_views(spark, sf_dir)
    return minhash_lsh_candidates(spark.table("documents"), k=8, bands=4)


# --- documents: text analysis ------------------------------------------------


_PUNCT_EXPR = (
    "(length(text) - length(regexp_replace(text, '[^" + "\\" + "w" + "\\" + "s]', '', 'g')))"
    " * 1.0 / greatest(length(text), 1)"
)
_STOP_EXPR = (
    "len(list_filter(toks, x -> x IN ('the','a','of','and','to')))"
    " * 1.0 / greatest(len(toks), 1)"
)
_MTL_EXPR = (
    "list_sum(list_transform(toks, x -> length(x))) * 1.0 / greatest(len(toks), 1)"
)


@q(
    "text_quality",
    f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') toks
  FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       cast(len(toks) AS INT) AS n_tokens,
       {_f6(_PUNCT_EXPR)} AS punct_ratio,
       {_f6(_STOP_EXPR)} AS stopword_ratio,
       {_f6(_MTL_EXPR)} AS mean_token_len
FROM t
""",
)
def _text_quality(spark, sf_dir):
    from .operators.textstats import text_quality

    register_views(spark, sf_dir)
    out = text_quality(spark.table("documents"))
    return out.select(
        "doc_id",
        "n_chars",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (F.floor(F.col("punct_ratio") * 1e6) / 1e6).alias("punct_ratio"),
        (F.floor(F.col("stopword_ratio") * 1e6) / 1e6).alias("stopword_ratio"),
        (F.floor(F.col("mean_token_len") * 1e6) / 1e6).alias("mean_token_len"),
    )


@q(
    "token_counts",
    """
SELECT doc_id,
       cast(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS INT) AS n_ws_tokens,
       cast(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_bpe_tokens
FROM documents
""",
)
def _token_counts(spark, sf_dir):
    from .operators.textstats import token_counts

    register_views(spark, sf_dir)
    out = token_counts(spark.table("documents"))
    return out.select(
        "doc_id",
        F.col("n_ws_tokens").cast("int").alias("n_ws_tokens"),
        F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
    )


@q(
    "doc_fingerprints",
    """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
""",
)
def _doc_fingerprints(spark, sf_dir):
    from .operators.textstats import doc_fingerprints

    register_views(spark, sf_dir)
    return doc_fingerprints(spark.table("documents"))


@q(
    "lang_id",
    """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') toks
  FROM documents),
s AS (
  SELECT doc_id,
         cast(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INT) score_de,
         cast(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS INT) score_en,
         cast(len(list_filter(toks, x -> x IN ('el','la','de','y','que'))) AS INT) score_es
  FROM t)
SELECT doc_id, score_de, score_en, score_es,
       CASE WHEN greatest(score_de, score_en, score_es) = 0 THEN 'und'
            WHEN score_de = greatest(score_de, score_en, score_es) THEN 'de'
            WHEN score_en = greatest(score_de, score_en, score_es) THEN 'en'
            ELSE 'es' END AS lang_guess
FROM s
""",
)
def _lang_id(spark, sf_dir):
    from .operators.textstats import lang_id_heuristic

    register_views(spark, sf_dir)
    out = lang_id_heuristic(spark.table("documents"))
    return out.select(
        "doc_id",
        F.col("score_de").cast("int").alias("score_de"),
        F.col("score_en").cast("int").alias("score_en"),
        F.col("score_es").cast("int").alias("score_es"),
        "lang_guess",
    )


# --- embeddings: similarity search -------------------------------------------


@q(
    "ann_topk",
    f"""
WITH q AS (SELECT vec_id query_id, embedding::DOUBLE[] qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id neighbor_id, embedding::DOUBLE[] cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         list_dot_product(c.cv, q.qv) / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM c, q WHERE c.neighbor_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) rank
  FROM scored)
SELECT query_id, neighbor_id, {_f6('cosine')} AS cosine, cast(rank AS INT) rank
FROM ranked WHERE rank <= 10
""",
)
def _ann_topk(spark, sf_dir):
    from .operators.annsearch import cosine_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id",
        "neighbor_id",
        (F.floor(F.col("cosine") * 1e6) / 1e6).alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


# --- TPC-H operator shapes ----------------------------------------------------


@q(
    "agg_pricing",
    f"""
SELECT l_returnflag, l_linestatus,
       {_f6('sum(l_quantity)')} AS sum_qty,
       {_f6('sum(l_extendedprice)')} AS sum_base_price,
       {_f6('avg(l_discount)')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def _agg_pricing(spark, sf_dir):
    register_views(spark, sf_dir)
    l = spark.table("lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        (F.floor(F.sum("l_quantity") * 1e6) / 1e6).alias("sum_qty"),
        (F.floor(F.sum("l_extendedprice") * 1e6) / 1e6).alias("sum_base_price"),
        (F.floor(F.avg("l_discount") * 1e6) / 1e6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "window_argmax",
    """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) rn
  FROM orders)
SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price
FROM ranked WHERE rn = 1
""",
)
def _window_argmax(spark, sf_dir):
    from pyspark.sql import Window

    register_views(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("best_order"),
            F.col("o_totalprice").alias("best_price"),
        )
    )


@q(
    "events_hourly",
    f"""
SELECT cast(date_trunc('hour', ts) AS STRING) AS hour, event_type,
       count(*) AS n, {_f6('sum(value)')} AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
""",
)
def _events_hourly(spark, sf_dir):
    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            (F.floor(F.sum("value") * 1e6) / 1e6).alias("sum_value"),
        )
    )


@q(
    "union_dedup",
    """
SELECT DISTINCT c_custkey AS custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
) u(c_custkey)
""",
)
def _union_dedup(spark, sf_dir):
    register_views(spark, sf_dir)
    a = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = spark.table("orders").filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.unionByName(b).distinct()


# --- rows-only (non-SQL-expressible: metaphone cascade, iterative CC) --------


@q("algo3_full")
def _algo3_full(spark, sf_dir):
    from .operators.algos import match_fuzzy

    t1, t2 = load_persons(spark, sf_dir)
    out = match_fuzzy(t1, t2, allow_swap=False)
    return out.select(
        "t1_id", "t2_id",
        (F.floor(F.col("confidence") * 1e6) / 1e6).alias("confidence"),
        "case_label",
    )


@q("algo4_full")
def _algo4_full(spark, sf_dir):
    from .operators.algos import match_fuzzy_no_mid

    t1, t2 = load_persons(spark, sf_dir)
    out = match_fuzzy_no_mid(t1, t2, allow_swap=True)
    return out.select(
        "t1_id", "t2_id",
        (F.floor(F.col("confidence") * 1e6) / 1e6).alias("confidence"),
        "case_label",
    )


@q("cascade_l10")
def _cascade_l10(spark, sf_dir):
    from .operators.cascade import match_level

    t1, t2 = load_persons(spark, sf_dir)
    out = match_level(t1, t2, 10, threshold=0.8, allow_swap=True)
    return out.select(
        "t1_id", "t2_id",
        (F.floor(F.col("confidence") * 1e6) / 1e6).alias("confidence"),
        "case_label",
    )


@q("entity_clusters")
def _entity_clusters(spark, sf_dir):
    from .operators.algos import match_fuzzy_no_mid
    from .operators.clustering import cluster_matches

    t1, t2 = load_persons(spark, sf_dir)
    pairs = match_fuzzy_no_mid(t1, t2)
    return cluster_matches(pairs).orderBy("node")


@q("simhash")
def _simhash(spark, sf_dir):
    from .operators.dedup import simhash_fingerprints

    register_views(spark, sf_dir)
    return simhash_fingerprints(spark.table("documents"))


@q("ann_lsh")
def _ann_lsh(spark, sf_dir):
    from .operators.annsearch import lsh_bucket_topk

    register_views(spark, sf_dir)
    return lsh_bucket_topk(spark.table("embeddings"), k=5, n_planes=4)


@q("households_opt6")
def _households_opt6(spark, sf_dir):
    """Opt6 role-swapped household aggregation over FuzzyNoMiddle pairs
    (tie arrival order is nondeterministic in the reference — HashMap
    iteration — so this is rows-only; semantics are pytest-verified
    against the arrival-order-faithful oracle)."""
    from .operators.algos import match_fuzzy_no_mid
    from .operators.households import household_aggregate

    t1, t2 = load_persons(spark, sf_dir)
    pairs = match_fuzzy_no_mid(t1, t2, allow_swap=False)
    out = household_aggregate(pairs, t1, t2, min_conf=0.8, option=6)
    return out.select(
        F.col("row_id").cast("long").alias("row_id"),
        "uuid",
        "hh_id",
        (F.floor(F.col("match_percentage") * 1e6) / 1e6).alias("match_percentage"),
    )


@q("cascade_run_exclusive")
def _cascade_run_exclusive(spark, sf_dir):
    """Full exclusive cascade L1/L2/L3/L10/L11 with per-level tags —
    the driver-loop orchestration (cascade.rs:622-903).  Exclusion
    makes levels order-dependent on fuzzy scores -> rows-only."""
    from .operators.cascade import CascadeConfig, run_cascade

    t1, t2 = load_persons(spark, sf_dir)
    results = run_cascade(
        t1, t2, CascadeConfig(levels=[1, 2, 3, 10, 11], threshold=0.8)
    )
    out = None
    for lr in results:
        lvl = lr.matches.select(
            "t1_id", "t2_id", F.lit(lr.level).alias("level")
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


@q(
    "embedding_near_dups",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
SELECT a.vec_id d1, b.vec_id d2,
       {_f6('list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))')} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.5
""",
)
def _embedding_near_dups(spark, sf_dir):
    from .operators.annsearch import embedding_near_dups

    register_views(spark, sf_dir)
    out = embedding_near_dups(
        spark.table("embeddings"), threshold=0.5, approximate=False
    )
    return out.select(
        "d1", "d2", (F.floor(F.col("cosine") * 1e6) / 1e6).alias("cosine")
    )


@q("embedding_near_dups_lsh")
def _embedding_near_dups_lsh(spark, sf_dir):
    """LSH-bucketed approximate variant (recall < 1 by design) —
    rows-only."""
    from .operators.annsearch import embedding_near_dups

    register_views(spark, sf_dir)
    return embedding_near_dups(spark.table("embeddings"), threshold=0.5)


@q("web_cluster_pages")
def _web_cluster_pages(spark, sf_dir):
    """North-rule pipeline end-to-end on a deterministic synthetic
    crawl (pages -> extract -> block -> score -> cluster).  Iterative
    clustering is not SQL-expressible -> rows-only check."""
    from .plans.web_pipeline import cluster_pages
    from .sources.web import generate_webpages

    pages = generate_webpages(spark, 2000, seed=42, partitions=8)
    return cluster_pages(pages).orderBy("id")
