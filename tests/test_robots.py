"""robots_decisions: REP semantics vs stdlib urllib.robotparser and the
closed form; every decision branch must fire."""

from __future__ import annotations

from quarrycore_spark.plans.registry import REGISTRY
from quarrycore_spark.plans.robots import PATHS
from tests.conftest import SF_SMOKE


def _rows(spark):
    return [
        r.asDict()
        for r in REGISTRY["robots_decisions"].run_spark(spark, SF_SMOKE).collect()
    ]


def test_decisions_match_stdlib_robotparser(spark):
    """The operator's longest-prefix (Google REP) semantics must agree
    with urllib.robotparser on the same rule set. Caveat: stdlib is
    FIRST-match, not longest-match — so the robots.txt lines are written
    with the more-specific Allow first, the ordering real-world robots
    files use precisely so the two semantics coincide."""
    import urllib.robotparser

    parsers = {}
    for s in range(7):
        dom = f"site{s}.example.com"
        lines = ["User-agent: *"]
        if s % 2 == 0:
            lines.append("Allow: /private/public")
        lines += ["Disallow: /private", "Disallow: /tmp"]
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(lines)
        parsers[dom] = rp
    rows = _rows(spark)
    assert rows
    for r in rows:
        want = parsers[r["domain"]].can_fetch("*", f"https://{r['domain']}{r['path']}")
        assert r["allowed"] == (1 if want else 0), r


def test_every_branch_fires(spark):
    rows = _rows(spark)
    by = {}
    for r in rows:
        by.setdefault((r["path"], r["domain"][:5]), set()).add(
            (r["matched_prefix"], r["allowed"])
        )
    paths = {r["path"] for r in rows}
    assert paths == set(PATHS)
    # default-allow (no rule matched)
    assert any(r["matched_prefix"] == "" and r["allowed"] == 1 for r in rows)
    # plain disallow
    assert any(r["matched_prefix"] == "/private" and r["allowed"] == 0
               for r in rows)
    assert any(r["matched_prefix"] == "/tmp" and r["allowed"] == 0
               for r in rows)
    # longest-prefix override on even sites only
    overrides = [r for r in rows if r["matched_prefix"] == "/private/public"]
    assert overrides and all(r["allowed"] == 1 for r in overrides)
    assert all(int(r["domain"][4]) % 2 == 0 for r in overrides)
    # odd sites: the same path falls back to the /private disallow
    odd_private_public = [
        r for r in rows
        if r["path"] == "/private/public/x" and int(r["domain"][4]) % 2 == 1
    ]
    assert odd_private_public
    assert all(r["allowed"] == 0 for r in odd_private_public)
