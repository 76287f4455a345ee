"""Domain classification + PII scanning for training-data pipelines, as
paired Spark/DuckDB queries over the `documents` table.

Reference semantics (extractor/domain_extractors.py):

* PII detection — MedicalExtractor._detect_pii (:225-235) scans the raw
  (case-preserved) text with four patterns (pii_patterns :158-164): SSN
  ddd-dd-dddd, date-of-birth dd/dd/dddd, "MRN:"/"Medical Record Number:"
  record ids, and 10+-digit runs. Here each pattern's non-overlapping
  match COUNT is a column (the reference keeps the match list; a 100 TB
  filter wants the counts and a flag, not the strings).
* Domain classification — DomainExtractorFactory.detect_best_domain
  (:1123-1148) scores the four domain extractors' keyword sets
  (MedicalExtractor :71-104, LegalExtractor :252-290, EcommerceExtractor
  :478-510, TechnicalExtractor :773-810) by SUBSTRING containment in the
  lowered text (calculate_domain_confidence :41-54):
      confidence = (matched / len(keywords)) * min(1, words / 1000)
  best domain wins, ties broken in declaration order (Python max over an
  insertion-ordered dict is first-wins), best < 0.3 -> ("general", 0.0).
  Integerized here as exact milli-units with floor division (the repo's
  no-floats-across-the-oracle rule):
      conf_milli = (matched * least(1000, words)) // len(keywords)
  threshold 300.

Both queries run the REAL operator expressions in BOTH dialects over the
real sf text augmented with a deterministic planted suffix derived from
doc_id (so every pattern and every domain actually fires at every sf and
the value hash is non-vacuous). The cross-engine comparison pins Java
regex vs RE2 agreement on the PII patterns and contains/lower/split
agreement on the classifier; tests/test_classify.py additionally pins
both engines against a pure-Python simulation of the reference formulas.

Everything is built-in column expressions — whole-stage-codegen JVM in
Spark, no Python in the hot path; one projection, no shuffle, so the
plan is embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from quarrycore_spark.functions import dialect as D
from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register

# --- reference data tables ---------------------------------------------------

# MedicalExtractor.pii_patterns (domain_extractors.py:158-164), scanned
# case-sensitively (reference _detect_pii uses re.findall with no flags).
PII_PATTERNS: dict[str, str] = {
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "dob": r"\b\d{2}/\d{2}/\d{4}\b",
    "mrn": r"\b(?:MRN|Medical Record Number):\s*\d+\b",
    "long_id": r"\b\d{10,}\b",
}

# The four extractors' domain_keywords sets, verbatim (data, not logic):
# MedicalExtractor :71-104, LegalExtractor :252-290, EcommerceExtractor
# :478-510, TechnicalExtractor :773-810. Declaration order here IS the
# reference's factory insertion order (:1105-1113) = the tie-break order.
DOMAIN_KEYWORDS: dict[str, tuple[str, ...]] = {
    "medical": (
        "patient", "diagnosis", "treatment", "therapy", "clinical",
        "medical", "disease", "syndrome", "disorder", "symptom",
        "procedure", "surgery", "medication", "drug", "dosage",
        "prescription", "pharmaceutical", "hospital", "clinic", "doctor",
        "physician", "nurse", "healthcare", "anatomy", "physiology",
        "pathology", "radiology", "oncology", "cardiology", "neurology",
        "pediatrics", "geriatrics", "psychiatry",
    ),
    "legal": (
        "court", "judge", "jury", "trial", "case", "lawsuit",
        "litigation", "plaintiff", "defendant", "attorney", "lawyer",
        "counsel", "barrister", "statute", "regulation", "law", "legal",
        "judicial", "jurisdiction", "appeal", "motion", "brief", "ruling",
        "verdict", "judgment", "sentence", "contract", "agreement",
        "liability", "damages", "injunction", "precedent",
        "constitutional", "federal", "state", "municipal", "civil",
        "criminal",
    ),
    "ecommerce": (
        "product", "price", "buy", "purchase", "order", "cart",
        "checkout", "shipping", "delivery", "return", "warranty",
        "guarantee", "review", "rating", "star", "customer", "seller",
        "brand", "model", "size", "color", "style", "material", "weight",
        "dimension", "specification", "inventory", "stock", "available",
        "sale", "discount", "offer",
    ),
    "technical": (
        "code", "function", "class", "method", "variable", "parameter",
        "api", "endpoint", "request", "response", "json", "xml", "http",
        "library", "framework", "dependency", "package", "module",
        "import", "version", "release", "update", "patch", "build",
        "deploy", "test", "performance", "benchmark", "optimization",
        "scalability", "latency", "documentation", "tutorial", "example",
        "guide", "reference", "manual",
    ),
}

GENERAL_FLOOR_MILLI = 300  # reference's 0.3 confidence floor (:1144)

# MedicalExtractor.extraction_patterns (domain_extractors.py:107-131),
# scanned case-INsensitively (extract_entities :196-211 passes
# re.IGNORECASE — expressed here as an inline (?i) both engines accept);
# per family the reference extends matches across patterns then
# set()-dedupes, so the column is the DISTINCT match count.
MEDICAL_ENTITY_PATTERNS: dict[str, tuple[str, ...]] = {
    "medications": (
        r"\b[A-Z][a-z]+(?:cin|nol|pril|sartan|statin|mycin|cillin)\b",
        r"\b(?:mg|mcg|IU|units?)\b",
        r"\b\d+\s*(?:mg|mcg|ml|cc|IU|units?)\b",
    ),
    "medical_conditions": (
        r"\b[A-Z][a-z]+(?:itis|osis|emia|uria|pathy|plasia|trophy)\b",
        r"\b(?:acute|chronic|severe|mild|moderate)\s+\w+\b",
    ),
    "procedures": (
        r"\b\w+(?:ectomy|otomy|ostomy|scopy|graphy|plasty)\b",
        r"\b(?:biopsy|surgery|operation|procedure|examination)\b",
    ),
    "anatomy": (
        r"\b(?:heart|brain|liver|kidney|lung|stomach|intestine|bone|muscle|nerve)\b",
        r"\b(?:anterior|posterior|superior|inferior|medial|lateral|proximal|distal)\b",
    ),
    "clinical_abbreviations": (
        r"\b(?:BP|HR|RR|O2|CO2|CBC|BUN|ECG|EKG|MRI|CT|PET|BMI)\b",
        r"\b(?:IV|IM|PO|PRN|BID|TID|QID|QD|HS|AC|PC)\b",
    ),
}

# --- dialect helpers ---------------------------------------------------------


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


def _word_count(expr: str, dialect: str) -> str:
    """len(text.split()) — exact Python-split semantics (count of
    non-whitespace runs; leading/trailing/newline whitespace free) via
    regexp_extract_all('\\S+'); trim/split would miscount around
    newlines (both engines' trim strips spaces only)."""
    if dialect == SPARK:
        return f"size(regexp_extract_all({expr}, '\\\\S+', 0))"
    return f"len(regexp_extract_all({expr}, '\\S+'))"


def domain_match_count(expr: str, domain: str, dialect: str) -> str:
    """Distinct-keyword containment count over the lowered text — the
    reference's sum(1 for kw in keywords if kw in text_lower). contains()
    exists in both engines; each keyword contributes 0/1 regardless of
    how often it appears."""
    return "(" + " + ".join(
        f"CASE WHEN contains({expr}, '{kw}') THEN 1 ELSE 0 END"
        for kw in DOMAIN_KEYWORDS[domain]
    ) + ")"


# --- planted augmentation ----------------------------------------------------


def pii_augmented_cte(dialect: str) -> str:
    """CTE `_aug`: doc_id, atext = text + a deterministic PII suffix.

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
    return (
        f"_aug AS (SELECT doc_id, "
        f"text || {decoys} || {ssn} || {dob} || {mrn} || {lid} AS atext "
        f"FROM documents)"
    )


def domain_augmented_cte(dialect: str) -> str:
    """CTE `_aug`: doc_id, atext = text + planted domain-keyword words.

    Per doc_id i: the first i%14 keywords (declaration order) of primary
    domain i%4, the first (i//4)%3 keywords of secondary domain (i+1)%4,
    and 5+i%7 inert filler words 'zq' (no domain keyword is a substring
    of 'zq' or vice versa) — plus 1000 extra filler words on every
    fifth doc, because the reference's 0.3 floor needs BOTH >=~0.3*K
    matched keywords AND >=1000 words: docs with i%14 >= 12 and i%5 = 0
    cross it, so every label (incl. 'general' on the rest) is reachable
    at the driver's 500-doc sf0.01 corpus."""
    if dialect == SPARK:
        def arr(words):  # noqa: E306
            return "array(" + ", ".join(f"'{w}'" for w in words) + ")"
        dv = "div"
    else:
        def arr(words):  # noqa: E306
            return "[" + ", ".join(f"'{w}'" for w in words) + "]"
        dv = "//"
    domains = list(DOMAIN_KEYWORDS)
    prim_arr = "CASE " + " ".join(
        f"WHEN doc_id % 4 = {j} THEN {arr(DOMAIN_KEYWORDS[d][:14])}"
        for j, d in enumerate(domains)
    ) + " END"
    sec_arr = "CASE " + " ".join(
        f"WHEN (doc_id + 1) % 4 = {j} THEN {arr(DOMAIN_KEYWORDS[d][:2])}"
        for j, d in enumerate(domains)
    ) + " END"
    nkw = "cast(doc_id % 14 as int)"
    nsec = f"cast((doc_id {dv} 4) % 3 as int)"
    prim = _planted(prim_arr, nkw, dialect)
    sec = _planted(sec_arr, nsec, dialect)
    filler = (
        "repeat(' zq', cast(5 + doc_id % 7 "
        "+ (CASE WHEN doc_id % 5 = 0 THEN 1000 ELSE 0 END) as int))"
    )
    return (
        f"_aug AS (SELECT doc_id, "
        f"text || {prim} || {sec} || {filler} AS atext FROM documents)"
    )


def _planted(arr_expr: str, n_expr: str, dialect: str) -> str:
    """' kw1 kw2 ...' for the first n entries of arr_expr, '' when n=0."""
    if dialect == SPARK:
        joined = f"array_join(slice({arr_expr}, 1, {n_expr}), ' ')"
    else:
        joined = f"array_to_string(list_slice({arr_expr}, 1, {n_expr}), ' ')"
    return f"(CASE WHEN {n_expr} = 0 THEN '' ELSE ' ' || {joined} END)"


# --- queries -----------------------------------------------------------------


def _pii_scan(dialect: str) -> str:
    counts = {k: regexp_count("atext", p, dialect) for k, p in PII_PATTERNS.items()}
    total = " + ".join(f"n_{k}" for k in PII_PATTERNS)
    cols = ",\n       ".join(f"{c} AS n_{k}" for k, c in counts.items())
    return f"""
WITH {pii_augmented_cte(dialect)},
_c AS (SELECT doc_id,
       {cols}
FROM _aug)
SELECT doc_id, n_ssn, n_dob, n_mrn, n_long_id,
       cast({total} as int) AS n_pii,
       cast(CASE WHEN {total} > 0 THEN 1 ELSE 0 END as int) AS has_pii
FROM _c
"""


register(
    Query(
        "pii_scan",
        "PII detection: per-pattern match counts + flag over planted-PII "
        "text (reference MedicalExtractor._detect_pii patterns; "
        "cross-engine Java-regex/RE2 parity)",
        _pii_scan,
    )
)


def _domain_classify(dialect: str) -> str:
    domains = list(DOMAIN_KEYWORDS)
    match_cols = ",\n       ".join(
        f"{domain_match_count('tl', d, dialect)} AS m_{d}" for d in domains
    )
    conf_cols = ",\n       ".join(
        D.idiv(f"(m_{d} * least(1000, wc))", str(len(DOMAIN_KEYWORDS[d])), dialect)
        + f" AS c_{d}"
        for d in domains
    )
    names = ", ".join(f"'{d}'" for d in domains)
    varr = ", ".join(f"c_{d}" for d in domains)
    if dialect == SPARK:
        va = f"array({varr})"
        mx = "element_at(sort_array(va, false), 1)"
        best = (
            f"element_at(array({names}), cast(array_position(va, {mx}) as int))"
        )
    else:
        va = f"[{varr}]"
        mx = "list_sort(va, 'DESC')[1]"
        best = f"[{names}][list_position(va, {mx})]"
    return f"""
WITH {domain_augmented_cte(dialect)},
_t AS (SELECT doc_id, lower(atext) AS tl FROM _aug),
_m AS (SELECT doc_id, {_word_count('tl', dialect)} AS wc,
       {match_cols}
FROM _t),
_c AS (SELECT doc_id, wc, m_medical, m_legal, m_ecommerce, m_technical,
       {conf_cols}
FROM _m),
_a AS (SELECT *, {va} AS va FROM _c)
SELECT doc_id, wc, m_medical, m_legal, m_ecommerce, m_technical,
       c_medical AS conf_medical_milli, c_legal AS conf_legal_milli,
       c_ecommerce AS conf_ecommerce_milli,
       c_technical AS conf_technical_milli,
       CASE WHEN {mx} < {GENERAL_FLOOR_MILLI} THEN 'general' ELSE {best} END
           AS domain,
       CASE WHEN {mx} < {GENERAL_FLOOR_MILLI} THEN 0 ELSE {mx} END
           AS domain_conf_milli
FROM _a
"""


register(
    Query(
        "domain_classify",
        "Domain-type classification: 4-domain keyword-containment vote "
        "with integerized confidence and the 0.3 general floor "
        "(reference DomainExtractorFactory.detect_best_domain)",
        _domain_classify,
    )
)


def entity_augmented_cte(dialect: str) -> str:
    """CTE `_aug`: doc_id, atext = text + planted clinical fragments so
    every entity family fires: a drug + dosage iff i%2=0, conditions iff
    i%3=0, procedures iff i%5=1, anatomy iff i%4=2, abbreviations iff
    i%6=3 — plus an inert tail no family matches."""
    frag = {
        2: "' Amoxicillin 500 mg dose '",
        3: "' gastritis and chronic pain '",
        5: "' biopsy then appendectomy '",
        4: "' the heart lateral wall '",
        6: "' MRI ordered BID '",
    }
    pieces = [
        f"CASE WHEN doc_id % 2 = 0 THEN {frag[2]} ELSE '' END",
        f"CASE WHEN doc_id % 3 = 0 THEN {frag[3]} ELSE '' END",
        f"CASE WHEN doc_id % 5 = 1 THEN {frag[5]} ELSE '' END",
        f"CASE WHEN doc_id % 4 = 2 THEN {frag[4]} ELSE '' END",
        f"CASE WHEN doc_id % 6 = 3 THEN {frag[6]} ELSE '' END",
    ]
    return (
        "_aug AS (SELECT doc_id, text || ' plain tail words ' || "
        + " || ".join(pieces)
        + " AS atext FROM documents)"
    )


def _distinct_matches(expr: str, patterns: tuple[str, ...], dialect: str) -> str:
    """size(set(findall(p1) + findall(p2) + ...)) — the reference's
    extend-then-set per entity family, as distinct match strings."""
    pats = [f"(?i){p}" for p in patterns]
    if dialect == SPARK:
        arrs = [f"regexp_extract_all({expr}, {_pat_lit(p, dialect)}, 0)" for p in pats]
        cat = arrs[0] if len(arrs) == 1 else "concat(" + ", ".join(arrs) + ")"
        return f"cast(size(array_distinct({cat})) as int)"
    arrs = [f"regexp_extract_all({expr}, {_pat_lit(p, dialect)})" for p in pats]
    cat = " || ".join(arrs)
    return f"cast(len(list_distinct({cat})) as int)"


def _medical_entities(dialect: str) -> str:
    cols = ",\n       ".join(
        f"{_distinct_matches('atext', pats, dialect)} AS n_{fam}"
        for fam, pats in MEDICAL_ENTITY_PATTERNS.items()
    )
    total = " + ".join(f"n_{fam}" for fam in MEDICAL_ENTITY_PATTERNS)
    return f"""
WITH {entity_augmented_cte(dialect)},
_c AS (SELECT doc_id,
       {cols}
FROM _aug)
SELECT doc_id, n_medications, n_medical_conditions, n_procedures,
       n_anatomy, n_clinical_abbreviations,
       cast({total} as int) AS n_entities
FROM _c
"""


register(
    Query(
        "medical_entities",
        "Clinical entity extraction: per-family distinct-match counts "
        "over planted+real text (reference MedicalExtractor."
        "extract_entities pattern table, case-insensitive)",
        _medical_entities,
    )
)
