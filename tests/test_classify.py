"""PII scan + domain classification: pure-Python simulations of the
reference semantics (domain_extractors.py) pinned against the DuckDB
dialect of the registered queries. Spark-vs-DuckDB parity over the real
sf0.01 corpus is covered by test_oracle_parity's registry sweep."""

from __future__ import annotations

import re

import duckdb
import pandas as pd

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.classify import (
    DOMAIN_KEYWORDS,
    GENERAL_FLOOR_MILLI,
    MEDICAL_ENTITY_PATTERNS,
    PII_PATTERNS,
    PII_REDACTIONS,
    _domain_classify,
    _medical_entities,
    _pii_redact,
    _pii_scan,
    domain_augmented_cte,
    entity_augmented_cte,
    pii_augmented_cte,
)

# --- reference-semantics simulations (pure Python over the same text) --------


def ref_pii(text: str) -> dict[str, int]:
    """MedicalExtractor._detect_pii: case-sensitive findall per pattern."""
    return {k: len(re.findall(p, text)) for k, p in PII_PATTERNS.items()}


def ref_domain(text: str) -> dict:
    """detect_best_domain + calculate_domain_confidence, integerized the
    same way as the query (milli-units, floor division)."""
    tl = text.lower()
    wc = len(tl.split())
    out: dict = {"wc": wc}
    confs = {}
    for d, kws in DOMAIN_KEYWORDS.items():
        m = sum(1 for kw in kws if kw in tl)
        out[f"m_{d}"] = m
        confs[d] = (m * min(1000, wc)) // len(kws)
        out[f"conf_{d}_milli"] = confs[d]
    best = max(confs, key=confs.get)  # first-wins tie-break, dict order
    if confs[best] < GENERAL_FLOOR_MILLI:
        out["domain"], out["domain_conf_milli"] = "general", 0
    else:
        out["domain"], out["domain_conf_milli"] = best, confs[best]
    return out


# --- fixtures -----------------------------------------------------------------

TEXTS = [
    "",  # empty
    "plain body text with nothing special in it at all",
    "the lawyer filed a lawsuit in court",  # 'lawyer' also contains 'law'
    "a\nb\n c  d\t e",  # newline/tab whitespace for the word count
    "MRN: 42 but also mrn: 43 and SSN 123-45-6789 born 01/02/1990",
    "id 12345678901 and shorter 123456789",
    ("patient diagnosis treatment therapy clinical medical disease "
     "syndrome disorder symptom " * 120),  # long medical text past the cap
    "order a product at a price in the cart checkout with shipping",
]


def docs_df(n: int = 60) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": list(range(n)), "text": [TEXTS[i % len(TEXTS)] for i in range(n)]}
    )


def run_duck(sql: str, docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(sql).fetchdf().sort_values("doc_id").reset_index(drop=True)


def augmented(cte: str, docs: pd.DataFrame) -> dict[int, str]:
    rows = run_duck(f"WITH {cte} SELECT doc_id, atext FROM _aug", docs)
    return dict(zip(rows["doc_id"], rows["atext"]))


# --- PII ----------------------------------------------------------------------


def test_pii_matches_python_reference():
    docs = docs_df()
    atexts = augmented(pii_augmented_cte(DUCKDB), docs)
    got = run_duck(_pii_scan(DUCKDB), docs)
    assert len(got) == len(docs)
    for _, row in got.iterrows():
        exp = ref_pii(atexts[row["doc_id"]])
        for k in PII_PATTERNS:
            assert row[f"n_{k}"] == exp[k], (row["doc_id"], k, dict(row))
        assert row["n_pii"] == sum(exp.values())
        assert row["has_pii"] == int(sum(exp.values()) > 0)


def test_pii_planting_fires_every_pattern():
    got = run_duck(_pii_scan(DUCKDB), docs_df())
    for k in PII_PATTERNS:
        assert got[f"n_{k}"].sum() > 0, f"pattern {k} never fired"
    # decoys only (doc 2: id%3!=0, %4!=1, %5!=2, %7!=3, inert text)
    base = got[got["doc_id"] == 2].iloc[0]
    assert base["n_ssn"] == 0 and base["n_dob"] == 0 and base["n_long_id"] == 0


def ref_redact(text: str) -> tuple[str, int]:
    """re.sub chain in PII_PATTERNS declaration order, counts pre-replace."""
    n = sum(len(re.findall(p, text)) for p in PII_PATTERNS.values())
    for k, p in PII_PATTERNS.items():
        text = re.sub(p, PII_REDACTIONS[k], text)
    return text, n


def test_pii_redact_matches_python_reference():
    docs = docs_df()
    atexts = augmented(pii_augmented_cte(DUCKDB), docs)
    got = run_duck(_pii_redact(DUCKDB), docs)
    assert len(got) == len(docs)
    for _, row in got.iterrows():
        exp_text, exp_n = ref_redact(atexts[row["doc_id"]])
        assert row["redacted"] == exp_text, row["doc_id"]
        assert row["n_redacted"] == exp_n
        assert row["redacted_len"] == len(exp_text)


def test_pii_redact_no_residual_and_consistent_with_scan():
    docs = docs_df()
    red = run_duck(_pii_redact(DUCKDB), docs)
    assert (red["n_residual"] == 0).all()
    assert red["n_redacted"].sum() > 0  # planting fires
    scan = run_duck(_pii_scan(DUCKDB), docs)
    merged = red.merge(scan, on="doc_id")
    # counts were taken on the same original text, so they must agree
    assert (merged["n_redacted"] == merged["n_pii"]).all()


def test_pii_redact_tokens_are_digit_free():
    # the ordering-safety invariant the chain relies on
    for tok in PII_REDACTIONS.values():
        assert not re.search(r"\d", tok)


def test_pii_case_sensitive_mrn():
    # reference scans case-sensitively: lowercase 'mrn:' must not match
    assert ref_pii("mrn: 123")["mrn"] == 0
    assert ref_pii("MRN: 123")["mrn"] == 1
    assert ref_pii("Medical Record Number: 9")["mrn"] == 1
    docs = docs_df(5)
    got = run_duck(_pii_scan(DUCKDB), docs)
    # doc 4 carries TEXTS[4] with one real MRN + one lowercase decoy pair
    row = got[got["doc_id"] == 4].iloc[0]
    atext = augmented(pii_augmented_cte(DUCKDB), docs)[4]
    assert row["n_mrn"] == ref_pii(atext)["mrn"] >= 1


# --- domain classification -----------------------------------------------------


def test_domain_matches_python_reference():
    docs = docs_df()
    atexts = augmented(domain_augmented_cte(DUCKDB), docs)
    got = run_duck(_domain_classify(DUCKDB), docs)
    assert len(got) == len(docs)
    for _, row in got.iterrows():
        exp = ref_domain(atexts[row["doc_id"]])
        for k, v in exp.items():
            assert row[k] == v, (row["doc_id"], k, row[k], v)


def test_domain_every_label_reachable():
    # at the driver's sf0.01 scale (500 doc ids) every label must fire
    docs = pd.DataFrame({"doc_id": range(500), "text": ["some plain text"] * 500})
    got = run_duck(_domain_classify(DUCKDB), docs)
    labels = set(got["domain"])
    assert labels == set(DOMAIN_KEYWORDS) | {"general"}, labels
    assert (got["domain"] == "general").sum() > 250  # floor honest: most docs


def test_domain_substring_counting():
    # 'lawyer' contains 'law' — the reference counts both (substring
    # containment, not word match)
    r = ref_domain("lawyer")
    assert r["m_legal"] == 2


def test_domain_tie_breaks_in_declaration_order():
    # all keywords of medical AND legal + >=1000 words: both confs 1000,
    # max() first-wins -> medical
    text = " ".join(DOMAIN_KEYWORDS["medical"] + DOMAIN_KEYWORDS["legal"])
    text += " zq" * 1000
    r = ref_domain(text)
    assert r["conf_medical_milli"] == r["conf_legal_milli"] == 1000
    assert r["domain"] == "medical"
    got = run_duck(
        _domain_classify(DUCKDB),
        pd.DataFrame({"doc_id": [0], "text": [text]}),
    )
    # planting on doc 0 adds medical words only (primary 0, nsec 0)
    assert got.iloc[0]["domain"] == "medical"


def test_domain_floor_returns_general_zero():
    r = ref_domain("nothing relevant here")
    assert r["domain"] == "general" and r["domain_conf_milli"] == 0


# --- medical entities -----------------------------------------------------


def ref_entities(text: str) -> dict[str, int]:
    """extract_entities (:196-211): per family, findall(IGNORECASE) across
    patterns, extend, set-dedup (strip is a no-op for these patterns —
    none can match edge whitespace)."""
    out = {}
    for fam, pats in MEDICAL_ENTITY_PATTERNS.items():
        matches: list[str] = []
        for p in pats:
            matches.extend(re.findall(p, text, re.IGNORECASE))
        out[fam] = len({m.strip() for m in matches if m.strip()})
    return out


def test_entities_match_python_reference():
    docs = docs_df()
    atexts = augmented(entity_augmented_cte(DUCKDB), docs)
    got = run_duck(_medical_entities(DUCKDB), docs)
    for _, row in got.iterrows():
        exp = ref_entities(atexts[row["doc_id"]])
        for fam in MEDICAL_ENTITY_PATTERNS:
            assert row[f"n_{fam}"] == exp[fam], (row["doc_id"], fam, dict(row))
        assert row["n_entities"] == sum(exp.values())


def test_entities_every_family_fires():
    got = run_duck(_medical_entities(DUCKDB), docs_df())
    for fam in MEDICAL_ENTITY_PATTERNS:
        assert got[f"n_{fam}"].sum() > 0, fam


def test_wordcount_python_split_semantics():
    docs = pd.DataFrame({"doc_id": [0], "text": ["a\nb\n c  d\t e"]})
    atext = augmented(domain_augmented_cte(DUCKDB), docs)[0]
    got = run_duck(_domain_classify(DUCKDB), docs)
    assert got.iloc[0]["wc"] == len(atext.split())
