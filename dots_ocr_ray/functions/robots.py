"""robots.txt parsing — the Robots Exclusion Protocol (RFC 9309).

`pipelines/graph.py:robots_filter` applies structured (host, prefix,
allow) rules; this module produces those rules from REAL robots.txt
text, implementing the deterministic core of the published RFC:

* line split on LF/CRLF, ``#`` comments stripped, keys
  case-insensitive, values trimmed;
* rules group under the preceding ``User-agent`` line(s); a group may
  list several agents;
* group selection for a product token: the group whose agent token is
  the LONGEST case-insensitive prefix of the product token wins;
  ``*`` matches any token with length 0 (the fallback group);
  RFC 9309 §2.2.1 — when a specific group matches, the ``*`` group
  does NOT also apply;
* ``Allow:`` / ``Disallow:`` with an EMPTY value means "no rule"
  (an empty Disallow allows everything — common in the wild);
* ``Crawl-delay`` (de-facto extension) is per group;
* ``Sitemap:`` lines are global, collected regardless of grouping.

Out of scope (documented, not silently wrong): ``*``/``$`` wildcards
inside paths — prefixes only, matching `robots_filter`'s
longest-prefix semantics.  Malformed lines are skipped; the parser
never raises.
"""

from __future__ import annotations


def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """Parse robots.txt text → ``{"rules": [(prefix, allow), ...],
    "crawl_delay": int|None, "sitemaps": [url, ...]}`` for ``agent``.

    ``rules`` come from the single best-matching group (longest
    agent-token prefix match; ``*`` is the fallback), in file order.
    """
    groups: list[dict] = []  # {"agents": [..], "rules": [..], "delay": int|None}
    sitemaps: list[str] = []
    current: dict | None = None
    awaiting_agents = False  # consecutive User-agent lines share a group

    for raw_line in (text or "").replace("\r\n", "\n").split("\n"):
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = line.split(":", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if key == "user-agent":
            if not value:
                continue
            if current is None or not awaiting_agents:
                current = {"agents": [], "rules": [], "delay": None}
                groups.append(current)
                awaiting_agents = True
            current["agents"].append(value.lower())
            continue
        awaiting_agents = False
        if current is None:
            continue  # rule before any User-agent line: ignored per RFC
        if key in ("allow", "disallow"):
            if value:  # empty value = no rule
                current["rules"].append((value, key == "allow"))
        elif key == "crawl-delay":
            try:
                current["delay"] = int(float(value))
            except ValueError:
                pass

    token = (agent or "*").lower()
    best, best_len = None, -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                if best_len < 0:
                    best, best_len = g, 0
            elif token.startswith(a) and len(a) > best_len:
                best, best_len = g, len(a)
    if best is None:
        return {"rules": [], "crawl_delay": None, "sitemaps": sitemaps}
    return {"rules": list(best["rules"]), "crawl_delay": best["delay"], "sitemaps": sitemaps}
