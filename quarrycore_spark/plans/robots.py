"""robots.txt decisions via longest-prefix-match, as a paired
Spark/DuckDB query.

The reference gates every fetch behind per-domain robots rules
(`crawler/robots.py`, RobotFileParser per host); at corpus scale the
same decision is a set-oriented join: a (domain, prefix, allow) rule
table against the URL list, most-specific rule wins. Semantics follow
the public REP as Google documents it: the rule with the LONGEST
matching path prefix decides; on a length tie Allow beats Disallow; a
URL matching no rule is allowed.

Synthesis device: each of the 7 synthesized hosts carries three rules —
Disallow /private, Allow /private/public (the classic longest-prefix
override, present only on even-numbered sites), Disallow /tmp — and
each doc renders a URL whose path cycles through /news, /private/x,
/private/public/x, /tmp/x and /about by doc_id, so every decision
branch (default-allow, disallow, override-allow, tie-free longest
match) fires at every sf. Both dialects run the REAL matching: a
prefix join + a per-URL window picking (prefix length DESC, allow
DESC) — not the closed form.

100-TB shape: the rule table is O(domains·rules) — tiny relative to the
corpus and broadcast by AQE (an explicit broadcast hint on the Spark
side); the prefix match runs as a LIKE-prefix theta-join inside the
broadcast nested loop over ~3 rules per URL's domain, then ONE window
exchange keyed by doc_id picks the winner. No corpus self-join, no
unbounded state; with a real million-rule blocklist the same shape
partitions the rule table by domain and the join becomes a hash join
on domain with the per-domain prefix scan inside.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register

PATHS = ("/news/story", "/private/x", "/private/public/x", "/tmp/cache",
         "/about")


def _robots_decisions(dialect: str) -> str:
    d = "div" if dialect == SPARK else "//"
    cast_str = "STRING" if dialect == SPARK else "VARCHAR"
    j = f"(doc_id {d} 2)"
    path_arms = " ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(PATHS)
    )
    # Rule table: (domain, prefix, allow) — Disallow /private and /tmp on
    # every site, Allow /private/public only on even sites.
    rule_rows = []
    for s in range(7):
        dom = f"site{s}.example.com"
        rule_rows.append(f"('{dom}', '/private', 0)")
        rule_rows.append(f"('{dom}', '/tmp', 0)")
        if s % 2 == 0:
            rule_rows.append(f"('{dom}', '/private/public', 1)")
    values = ", ".join(rule_rows)
    if dialect == SPARK:
        rules = f"SELECT * FROM VALUES {values} AS t(domain, prefix, allow)"
        hint = "/*+ BROADCAST(r) */ "
    else:
        rules = f"SELECT * FROM (VALUES {values}) t(domain, prefix, allow)"
        hint = ""
    return f"""
WITH _u AS (
  SELECT doc_id,
         concat('site', cast({j} % 7 AS {cast_str}), '.example.com')
             AS domain,
         (CASE {j} % {len(PATHS)} {path_arms} END) AS path
  FROM documents),
_r AS ({rules}),
_m AS (
  SELECT {hint}u.doc_id, u.domain, u.path, r.prefix, r.allow,
         row_number() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.prefix) DESC, r.allow DESC
         ) AS rn
  FROM _u u JOIN _r r
    ON u.domain = r.domain AND u.path LIKE r.prefix || '%'),
_w AS (SELECT doc_id, prefix, allow FROM _m WHERE rn = 1)
SELECT u.doc_id, u.domain, u.path,
       coalesce(w.prefix, '') AS matched_prefix,
       cast(coalesce(w.allow, 1) AS int) AS allowed
FROM _u u LEFT JOIN _w w ON u.doc_id = w.doc_id
"""


register(Query(
    "robots_decisions",
    "robots.txt longest-prefix-match decisions (Allow wins ties, "
    "no-match allows): broadcast rule join + one winner window",
    _robots_decisions,
))
