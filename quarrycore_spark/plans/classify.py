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


# Shared regex fragments + planted-PII augmentation (moved to
# functions/plants.py to break the plans-module import cycle);
# re-exported here for back-compat.
from quarrycore_spark.functions.plants import (  # noqa: E402,F401
    PII_PATTERNS,
    _pat_lit,
    pii_augmented_cte,
    regexp_count,
)


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


# Redaction tokens, applied in PII_PATTERNS declaration order (the
# reference's scan order). Tokens are digit-free so an earlier
# replacement can never create or extend a later pattern's match.
PII_REDACTIONS: dict[str, str] = {
    "ssn": "[SSN]",
    "dob": "[DOB]",
    "mrn": "[MRN]",
    "long_id": "[ID]",
}


def regexp_replace_all(expr: str, pattern: str, repl: str, dialect: str) -> str:
    """Replace EVERY non-overlapping match (Spark's regexp_replace is
    global by default; DuckDB's replaces only the first without 'g')."""
    lit = _pat_lit(pattern, dialect)
    if dialect == SPARK:
        return f"regexp_replace({expr}, {lit}, '{repl}')"
    return f"regexp_replace({expr}, {lit}, '{repl}', 'g')"


def _pii_redact(dialect: str) -> str:
    """PII redaction transform: the scan's action half. The reference
    detects PII and rejects the document (MedicalExtractor._detect_pii →
    metadata flag); a training pipeline that KEEPS the page needs the
    in-place redaction. One projection chain — four regexp_replace calls
    nested in declaration order — so the whole transform is a single
    whole-stage-codegen map over the corpus: no shuffle, no UDF, scales
    as a pure scan at 100 TB.

    Counts are taken on the ORIGINAL text (same expressions as
    `pii_scan`) and `n_residual` re-scans the redacted text — a
    self-auditing invariant (0 everywhere) that also pins cross-engine
    regexp_replace agreement into the value hash."""
    chain = "atext"
    for k, p in PII_PATTERNS.items():
        chain = regexp_replace_all(chain, p, PII_REDACTIONS[k], dialect)
    n_before = " + ".join(
        regexp_count("atext", p, dialect) for p in PII_PATTERNS.values()
    )
    n_after = " + ".join(
        regexp_count("redacted", p, dialect) for p in PII_PATTERNS.values()
    )
    return f"""
WITH {pii_augmented_cte(dialect)},
_r AS (SELECT doc_id,
       {chain} AS redacted,
       cast({n_before} as int) AS n_redacted
FROM _aug)
SELECT doc_id, redacted,
       n_redacted,
       cast(length(redacted) as int) AS redacted_len,
       cast({n_after} as int) AS n_residual
FROM _r
"""


register(
    Query(
        "pii_redact",
        "PII redaction transform: global regexp_replace chain in scan "
        "order over planted-PII text; counts before + residual after "
        "(cross-engine replace parity pinned in the hash)",
        _pii_redact,
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
