"""RFC 9309 robots.txt parser (functions/robots.py)."""

from dots_ocr_ray.functions.robots import parse_robots_txt

SAMPLE = """
# policy
User-agent: *
Disallow: /private/
Crawl-delay: 3
Sitemap: https://a.test/sitemap.xml

User-agent: GraftBot
User-agent: OtherBot
Disallow: /docs
Allow: /docs/public
Disallow:

Sitemap: https://a.test/sitemap2.xml
"""


def test_specific_group_wins_outright():
    p = parse_robots_txt(SAMPLE, agent="graftbot")
    assert p["rules"] == [("/docs", False), ("/docs/public", True)]
    # the * group's crawl-delay does NOT leak into the specific group
    assert p["crawl_delay"] is None


def test_fallback_group_and_globals():
    p = parse_robots_txt(SAMPLE, agent="unknownbot")
    assert p["rules"] == [("/private/", False)]
    assert p["crawl_delay"] == 3
    # sitemaps are global regardless of group selection
    assert p["sitemaps"] == [
        "https://a.test/sitemap.xml",
        "https://a.test/sitemap2.xml",
    ]


def test_longest_agent_prefix_match():
    txt = "User-agent: graft\nDisallow: /a\n\nUser-agent: graftbot\nDisallow: /b\n"
    assert parse_robots_txt(txt, agent="graftbot-1.0")["rules"] == [("/b", False)]
    assert parse_robots_txt(txt, agent="graftx")["rules"] == [("/a", False)]


def test_shared_group_multiple_agents():
    p = parse_robots_txt(SAMPLE, agent="otherbot")
    assert p["rules"] == [("/docs", False), ("/docs/public", True)]


def test_malformed_never_raises():
    for txt in ["", None, "Disallow: /orphan\n", ":\n::\nUser-agent:\n", "Crawl-delay: soon\nUser-agent: *\nCrawl-delay: nope\nDisallow: /x\n"]:
        p = parse_robots_txt(txt, agent="graftbot")
        assert isinstance(p["rules"], list)
    # CRLF and comments
    p = parse_robots_txt("User-agent: *\r\nDisallow: /a # inline\r\n", agent="x")
    assert p["rules"] == [("/a", False)]
