"""Staged CSV→table import: dry-run validation + atomic swap commit.

Reference semantics (`src/import/mod.rs:44-200`,
`src/import/staging.rs:24-792`): an import job parses the CSV, runs a
DRY-RUN validation pass (typed coercion + required-field checks +
duplicate probe, first 10 invalid rows sampled with their file row
numbers), loads into a staging table `_nm_stage_<job>`, and commits by
an atomic `RENAME TABLE` swap; staging tables whose job never commits
are garbage-collected (`drop_orphan_staging_tables`,
staging.rs:734-756).

Spark-first re-expression: validation is a single JVM Column
projection over the DataFrame (no Python in the row path — reasons are
an array<string> column); the staging area is a parquet directory
under the target SnapshotTable; the atomic swap is the SnapshotTable
HEAD flip (exactly an Iceberg snapshot commit — on a real cluster
`df.writeTo(tbl).append()` / `.replace()`).  A failure at ANY point
before the HEAD flip leaves readers on the previous snapshot.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import SnapshotTable

__all__ = [
    "ImportPolicy",
    "DryRunReport",
    "staging_dir_name",
    "validation_reasons_col",
    "dry_run",
    "staged_import",
    "drop_orphan_stages",
    "write_jdbc_staged",
]


@dataclass
class ImportPolicy:
    """run_service DTO subset that affects validation/commit
    (CsvImportRequestDto policy + target mode)."""

    id_behavior: str = "provided"  # "provided" | "db_auto_increment"
    duplicate_key: str = "id"  # "id" | "uuid" | "matcher_fields"
    duplicate_behavior: str = "keep"  # "keep" | "skip" | "update"
    mode: str = "append"  # "append" | "replace"


@dataclass
class DryRunReport:
    """CsvImportDryRunResultDto twin (mod.rs:76-140)."""

    total_rows: int
    valid_rows: int
    invalid_rows: int
    duplicate_rows: int
    invalid_samples: list[tuple[int, str]] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def staging_dir_name(job_id: str) -> str:
    """`_nm_stage_<job>` (staging.rs:34-60; path-safe subset)."""
    safe = "".join(c for c in job_id if c.isalnum() or c in "-_")[:40]
    if not safe:
        raise ValueError("job_id must contain path-safe characters")
    return f"_nm_stage_{safe}"


def _dup_key_col(policy: ImportPolicy):
    """duplicate_key (mod.rs duplicate_key fn): id / uuid / matcher
    fields first|last|birthdate with None -> ''."""
    if policy.duplicate_key == "id":
        # coalesce like the uuid/matcher variants: concat with a NULL
        # id yields a NULL key, and NULL never equals itself in the
        # dedup joins — null-id rows (reachable with allow_invalid)
        # would be silently dropped instead of imported
        return F.concat(
            F.lit("id:"), F.coalesce(F.col("id").cast("string"), F.lit(""))
        )
    if policy.duplicate_key == "uuid":
        return F.concat(F.lit("uuid:"), F.coalesce(F.col("uuid"), F.lit("")))
    return F.concat(
        F.lit("m:"),
        F.coalesce(F.col("first_name"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col("last_name"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col("birthdate").cast("string"), F.lit("")),
    )


def validation_reasons_col(policy: ImportPolicy):
    """array<string> of per-row rejection reasons — the JVM projection
    twin of collect_invalid_rows (mod.rs:421-457).  Typed-coercion
    failures surface as NULLs from the loader (strict date parse /
    try_cast), so the NULL checks below catch them too."""
    reasons = []
    if policy.id_behavior != "db_auto_increment":
        reasons.append(
            F.when(
                F.col("id").isNull() | (F.col("id") <= 0),
                F.lit("id must be greater than zero"),
            )
        )
    reasons.append(
        F.when(
            F.trim(F.coalesce(F.col("first_name"), F.lit(""))) == "",
            F.lit("first_name is required"),
        )
    )
    reasons.append(
        F.when(
            F.trim(F.coalesce(F.col("last_name"), F.lit(""))) == "",
            F.lit("last_name is required"),
        )
    )
    reasons.append(
        F.when(F.col("birthdate").isNull(), F.lit("birthdate is required"))
    )
    return F.filter(F.array(*reasons), lambda x: x.isNotNull())


def _with_row_numbers(df: DataFrame) -> DataFrame:
    """File-order row numbers starting at 2 (header is row 1) —
    invalid-sample row_number semantics (mod.rs:449-452).  zipWithIndex
    is deterministic for a deterministic input partition order (one
    pass; import validation is one-shot, not a hot path).  If the
    frame already carries ``_row_number`` (stamped at stage time so
    the ordering survives the parquet round trip — Spark re-bins read
    files by size, NOT write order), it is kept as-is."""
    if "_row_number" in df.columns:
        return df
    rdd = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + 2))
    return df.sparkSession.createDataFrame(
        rdd, df.schema.add("_row_number", "long")
    )


def dry_run(
    df: DataFrame,
    policy: ImportPolicy,
    existing: DataFrame | None = None,
    sample_limit: int = 10,
) -> DryRunReport:
    """Validate without writing (validate_import_plan, mod.rs:44-49).

    ``existing`` is the current target table (append mode) for the
    existing-duplicate probe; the reported duplicate count is
    max(input duplicates, existing-key hits) like mod.rs:96-101.
    """
    key = _dup_key_col(policy)
    flagged = df.withColumn("_reasons", validation_reasons_col(policy))
    agg = flagged.agg(
        F.count("*").alias("total"),
        F.sum((F.size("_reasons") > 0).cast("long")).alias("invalid"),
        F.count_distinct(key).alias("n_keys"),
    ).collect()[0]
    total, invalid = int(agg["total"]), int(agg["invalid"] or 0)
    input_dups = total - int(agg["n_keys"])

    existing_dups = 0
    warnings: list[str] = []
    if existing is not None:
        existing_keys = existing.select(_dup_key_col(policy).alias("_k")).distinct()
        existing_dups = (
            df.select(key.alias("_k")).join(existing_keys, "_k", "left_semi").count()
        )
    dup_rows = max(input_dups, existing_dups)
    if dup_rows > 0:
        warnings.append(
            f"{dup_rows} duplicate row(s) detected for {policy.duplicate_key!r}"
        )
    if policy.mode == "replace":
        warnings.append(
            "Replace mode will delete existing destination rows before import."
        )
    if policy.duplicate_behavior == "update":
        warnings.append("Update mode can overwrite existing destination fields.")

    samples: list[tuple[int, str]] = []
    if invalid > 0:
        bad = (
            _with_row_numbers(df)
            .withColumn("_reasons", validation_reasons_col(policy))
            .filter(F.size("_reasons") > 0)
            .select("_row_number", F.array_join("_reasons", ", ").alias("_reason"))
            .orderBy("_row_number")
            .limit(sample_limit)
            .collect()
        )
        samples = [(int(r["_row_number"]), r["_reason"]) for r in bad]

    return DryRunReport(
        total_rows=total,
        valid_rows=total - invalid,
        invalid_rows=invalid,
        duplicate_rows=dup_rows,
        invalid_samples=samples,
        warnings=warnings,
    )


def staged_import(
    spark: SparkSession,
    df: DataFrame,
    table: SnapshotTable,
    job_id: str,
    policy: ImportPolicy | None = None,
    allow_invalid: bool = False,
) -> dict:
    """Stage -> validate -> atomic commit (commit_staged,
    staging.rs:169-360 + RENAME swap :590-640).

    1. write the input to ``<table>/staging/<job>/`` (the `_nm_stage_`
       twin — durable, inspectable, NOT visible to readers)
    2. dry-run validate the staged read-back (so typed parquet
       round-trip is what's validated, like the typed staging DDL)
    3. abort (stage left for inspection/GC) if invalid rows and not
       ``allow_invalid``
    4. duplicate_behavior == "skip": keep the first occurrence per key
       (file order), and in append mode drop keys already in the table;
       "update": LAST occurrence per key wins (INSERT .. ON DUPLICATE
       KEY UPDATE row order, staging.rs) and replaces existing rows
       with the same key
    5. commit — ONE atomic HEAD flip either way:
       * append (keep/skip): O(batch) ``SnapshotTable.append`` — only
         the staged rows are written; parent files are referenced
         unchanged in the manifest (never rewritten)
       * replace, or append+update: full ``commit`` (update is
         copy-on-write — surviving existing rows must be rewritten,
         exactly Iceberg's copy-on-write MERGE)
    6. drop the staging dir on success
    """
    policy = policy or ImportPolicy()
    stage_dir = os.path.join(table.path, "staging", staging_dir_name(job_id))
    # stamp input (file) order before staging: parquet read-back order
    # is size-binned, not write order, so "first occurrence" and sample
    # row numbers must travel as data
    _with_row_numbers(df).write.mode("overwrite").parquet(stage_dir)
    staged = spark.read.parquet(stage_dir)

    head = table.current_snapshot()
    existing = table.read(spark) if head is not None and policy.mode == "append" else None
    report = dry_run(staged, policy, existing=existing)
    if report.invalid_rows > 0 and not allow_invalid:
        return {
            "status": "validation_failed",
            "report": report,
            "staging_dir": stage_dir,
            "snapshot_id": None,
        }

    final = staged
    rewrite_existing: DataFrame | None = None
    if policy.duplicate_behavior == "skip":
        numbered = staged.withColumn("_k", _dup_key_col(policy))
        first = numbered.groupBy("_k").agg(F.min("_row_number").alias("_row_number"))
        final = (
            numbered.join(first, ["_k", "_row_number"])
            .drop("_k")
        )
        if existing is not None:
            keep = final.withColumn("_k", _dup_key_col(policy)).join(
                existing.select(_dup_key_col(policy).alias("_k")).distinct(),
                "_k",
                "left_anti",
            )
            final = keep.drop("_k")
    elif policy.duplicate_behavior == "update":
        # last occurrence per key wins within the batch (row-order
        # INSERT .. ON DUPLICATE KEY UPDATE semantics), and staged rows
        # replace existing rows carrying the same key
        numbered = staged.withColumn("_k", _dup_key_col(policy))
        last = numbered.groupBy("_k").agg(F.max("_row_number").alias("_row_number"))
        final = numbered.join(last, ["_k", "_row_number"]).drop("_k")
        if existing is not None:
            staged_keys = final.select(_dup_key_col(policy).alias("_k")).distinct()
            rewrite_existing = (
                existing.withColumn("_k", _dup_key_col(policy))
                .join(staged_keys, "_k", "left_anti")
                .drop("_k")
            )

    final = final.drop("_row_number")
    if existing is not None and rewrite_existing is None:
        # O(batch) append: parent data files are referenced in the new
        # manifest, never rewritten (staged INSERT + atomic RENAME in
        # the reference never touches existing rows either)
        snap = table.append(final)
    else:
        if rewrite_existing is not None:
            final = rewrite_existing.unionByName(final)
        snap = table.commit(final, parent=head)
    shutil.rmtree(stage_dir, ignore_errors=True)
    return {
        "status": "committed",
        "report": report,
        "staging_dir": None,
        "snapshot_id": snap,
    }


def drop_orphan_stages(table: SnapshotTable) -> int:
    """GC staging dirs left by aborted jobs
    (drop_orphan_staging_tables, staging.rs:734-756)."""
    root = os.path.join(table.path, "staging")
    if not os.path.isdir(root):
        return 0
    n = 0
    for name in os.listdir(root):
        if name.startswith("_nm_stage_"):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            n += 1
    return n


def write_jdbc_staged(
    df: DataFrame,
    url: str,
    table: str,
    job_id: str,
    properties: dict | None = None,
) -> str:
    """Thin JDBC staging write for a real MySQL target (untestable in
    this sandbox — no MySQL; staging.rs:169-360 semantics).  Writes to
    `_nm_stage_<job>` via the Spark JDBC sink; the caller performs the
    `RENAME TABLE` swap through its own connection (Spark's JDBC API
    has no DDL surface)."""
    stage = staging_dir_name(job_id)
    writer = df.write.format("jdbc").option("url", url).option("dbtable", stage)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode("overwrite").save()
    return stage
