"""Crawl-policy operators: robots.txt compliance filtering.

The politeness step between URL frontier and fetch in every crawl
pipeline (and the compliance re-check data pipelines run before using
a crawl): parse each domain's robots.txt with stdlib
``urllib.robotparser`` and evaluate every candidate URL for the
pipeline's user agent.  Parsers are cached per domain within each Arrow
batch — a frontier has many URLs per domain, so parse cost is
O(domains), not O(urls).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def robots_filter(
    df: DataFrame,
    agent: str = "overseer-bot",
    url_col: str = "url",
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Evaluate (url, domain, robots_txt) rows against ``agent``:
    emits the input keys plus ``allowed`` and the domain's
    ``crawl_delay`` for the agent (NULL when unspecified).  Pure
    stdlib semantics — agent-section matching, first-match-wins
    Allow/Disallow lines — exactly what a production fetcher obeys."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from urllib.robotparser import RobotFileParser

        import pandas as pd

        for pdf in it:
            parsers: dict[str, RobotFileParser] = {}
            allowed, delays = [], []
            for dom, robots, url in zip(
                pdf[domain_col], pdf[robots_col], pdf[url_col]
            ):
                rp = parsers.get(dom)
                if rp is None:
                    rp = RobotFileParser()
                    rp.parse((robots or "").splitlines())
                    parsers[dom] = rp
                allowed.append(bool(rp.can_fetch(agent, url)))
                d = rp.crawl_delay(agent)
                delays.append(int(d) if d is not None else None)
            out = pdf[[c for c in pdf.columns if c != robots_col]].copy()
            out["allowed"] = allowed
            out["crawl_delay"] = pd.array(delays, dtype="Int32")
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != robots_col
    )
    return df.mapInPandas(
        batches, schema=f"{schema}, allowed boolean, crawl_delay int"
    )
