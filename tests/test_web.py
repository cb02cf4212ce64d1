"""robots.txt compliance operator: stdlib robotparser semantics through
the Spark seam — agent-section matching, Allow-before-Disallow
first-match, crawl delays, and the deny-all fallback for other agents."""

import pandas as pd

from overseer_spark.operators.web import robots_filter

_ROBOTS = (
    "User-agent: overseer-bot\n{rules}\nCrawl-delay: {delay}\n\n"
    "User-agent: *\nDisallow: /\n"
)


def _frontier(spark, agent_rules):
    rows = []
    for dom, (rules, delay) in agent_rules.items():
        for p in (0, 1):
            rows.append(
                (
                    f"https://www.{dom}/p/{p}",
                    dom,
                    _ROBOTS.format(rules=rules, delay=delay),
                )
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "domain", "robots_txt"])
    )


def test_robots_filter_rule_semantics(spark):
    df = _frontier(
        spark,
        {
            "allow.com": ("Allow: /p/\nDisallow: /", 1),
            "deny.com": ("Disallow: /p/", 2),
            "other.com": ("Disallow: /static/", 3),
        },
    )
    out = {(r["domain"], r["url"]): r for r in robots_filter(df).collect()}
    assert len(out) == 6
    for (dom, _url), r in out.items():
        want = dom != "deny.com"
        assert r["allowed"] is want, (dom, r)
    assert out[("allow.com", "https://www.allow.com/p/0")]["crawl_delay"] == 1
    assert out[("deny.com", "https://www.deny.com/p/1")]["crawl_delay"] == 2


def test_robots_filter_other_agents_hit_deny_all(spark):
    df = _frontier(spark, {"allow.com": ("Allow: /p/\nDisallow: /", 1)})
    out = robots_filter(df, agent="some-other-crawler").collect()
    assert all(r["allowed"] is False for r in out)
    assert all(r["crawl_delay"] is None for r in out)


def test_robots_filter_empty_robots_defaults_allow(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [("https://x.com/a", "x.com", "")],
            columns=["url", "domain", "robots_txt"],
        )
    )
    r = robots_filter(df).collect()[0]
    assert r["allowed"] is True
    assert r["crawl_delay"] is None
