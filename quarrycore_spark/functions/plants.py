"""Deterministic planted augmentations + shared regex SQL fragments.

The registered queries over the synthetic sf corpora plant deterministic
doc_id-derived signal (PII suffixes, repeated/boilerplate lines) so every
operator demonstrably fires at every scale factor, and several query
modules (classify, repetition, funnel) share those CTE builders and the
cross-engine regexp fragment helpers. They live here — outside `plans/`
— for the same reason as `textfrag.py`: `plans/*` modules import the
registry, whose registration block imports every `plans/*` module, so a
helper defined in one plans module and imported by another is a circular
import whenever the defining module happens to be the interpreter's
entry point. The original homes re-export every name for back-compat.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK


# MedicalExtractor.pii_patterns (domain_extractors.py:158-164), scanned
# case-sensitively (reference _detect_pii uses re.findall with no flags).
PII_PATTERNS: dict[str, str] = {
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "dob": r"\b\d{2}/\d{2}/\d{4}\b",
    "mrn": r"\b(?:MRN|Medical Record Number):\s*\d+\b",
    "long_id": r"\b\d{10,}\b",
}


# Gopher-inspired removal thresholds, in milli-units of the
# distinct-fraction variants computed here (MassiveText uses 0.30 for
# duplicate line FRACTION; the n-gram rules there are char-mass based —
# the distinct-count variant is the shuffle-free per-row analogue).
DUP_LINE_MILLI_MAX = 300
DUP_2GRAM_MILLI_MAX = 200
DUP_3GRAM_MILLI_MAX = 180



def _pat_lit(pattern: str, dialect: str) -> str:
    """The regex as a SQL string literal. Spark string literals process
    backslash escapes (parser default), DuckDB's do not."""
    body = pattern.replace("\\", "\\\\") if dialect == SPARK else pattern
    return "'" + body + "'"


def regexp_count(expr: str, pattern: str, dialect: str) -> str:
    """Count of non-overlapping matches, as int."""
    lit = _pat_lit(pattern, dialect)
    if dialect == SPARK:
        return f"cast(regexp_count({expr}, {lit}) as int)"
    return f"cast(len(regexp_extract_all({expr}, {lit})) as int)"



def pii_augmented_cte(
    dialect: str,
    name: str = "_aug",
    src: str = "documents",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> str:
    """CTE `{name}`: doc_id, atext = {text_col} + a deterministic PII
    suffix (composable: `plans/funnel.py` chains it after the repetition
    augmentation by renaming the CTE and re-pointing src/text_col).

    Per doc_id i: an SSN iff i%3=0, a DOB iff i%4=1, an MRN (long form
    'Medical Record Number' on odd ids) iff i%5=2, a 10-digit id iff
    i%7=3 — plus always-on decoys that must NOT match any pattern
    (wrong shapes: 12-345, a version string, a 9-digit run, and a
    lowercase 'mrn: 1' that the case-sensitive scan must skip)."""
    fmt = "printf" if dialect != SPARK else "format_string"
    ssn = (
        f"CASE WHEN doc_id % 3 = 0 THEN ' ssn ' || "
        f"{fmt}('%03d-%02d-%04d', 100 + doc_id % 898, 10 + doc_id % 89, "
        f"1000 + doc_id % 8999) ELSE '' END"
    )
    dob = (
        f"CASE WHEN doc_id % 4 = 1 THEN ' dob ' || "
        f"{fmt}('%02d/%02d/%04d', 1 + doc_id % 12, 1 + doc_id % 28, "
        f"1950 + doc_id % 50) ELSE '' END"
    )
    mrn = (
        f"CASE WHEN doc_id % 5 != 2 THEN '' "
        f"WHEN doc_id % 2 = 1 THEN ' Medical Record Number: ' "
        f"|| CAST(10000 + doc_id AS {'STRING' if dialect == SPARK else 'VARCHAR'}) "
        f"ELSE ' MRN: ' "
        f"|| CAST(10000 + doc_id AS {'STRING' if dialect == SPARK else 'VARCHAR'}) END"
    )
    lid = (
        f"CASE WHEN doc_id % 7 = 3 THEN ' id ' || "
        f"{fmt}('%010d', 977 * doc_id + 1) ELSE '' END"
    )
    decoys = "' ref 12-345 v1.2.3 run 123456789 mrn: 1 '"
    extra = "".join(f", {c}" for c in passthrough)
    return (
        f"{name} AS (SELECT doc_id, "
        f"{text_col} || {decoys} || {ssn} || {dob} || {mrn} || {lid} AS atext"
        f"{extra} FROM {src})"
    )



def repetition_augmented_cte(
    dialect: str,
    name: str = "_aug",
    src: str = "documents",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> str:
    """CTE `{name}`: doc_id, atext = {text_col} + deterministic planted
    lines (composable: `plans/funnel.py` chains it with the PII
    augmentation by renaming the CTE and pointing src at another CTE).

    Per doc_id i: `i % 5` copies of one fixed line (within-doc duplicate
    lines), `i % 3` unique lines salted with doc_id (distinct mass), a
    repeated ' spam ham' run of length `i % 6` (duplicate 2-/3-grams),
    and two corpus-boilerplate lines gated on i%4=0 / i%7=2 (cross-doc
    duplicates for corpus_dup_lines). All pieces are newline-joined so
    the line split actually has work to do at every sf."""
    nl = "chr(10)"
    dup_line = f"repeat({nl} || 'dup line alpha beta', cast(doc_id % 5 as int))"
    uniq1 = (
        f"case when doc_id % 3 >= 1 then {nl} || 'uniq ' || doc_id || ' one' "
        f"else '' end"
    )
    uniq2 = (
        f"case when doc_id % 3 >= 2 then {nl} || 'uniq ' || doc_id || ' two' "
        f"else '' end"
    )
    spam = f"repeat(' spam ham', cast(doc_id % 6 as int))"
    boiler1 = (
        f"case when doc_id % 4 = 0 then {nl} || 'copyright boilerplate row' "
        f"else '' end"
    )
    boiler2 = (
        f"case when doc_id % 7 = 2 then {nl} || 'subscribe to our newsletter' "
        f"else '' end"
    )
    extra = "".join(f", {c}" for c in passthrough)
    return (
        f"{name} AS (SELECT doc_id, "
        f"{text_col} || {spam} || {dup_line} || {uniq1} || {uniq2} "
        f"|| {boiler1} || {boiler2} AS atext{extra} FROM {src})"
    )


