"""RFC 9309 robots.txt parsing + distributed crawl decisions."""

from __future__ import annotations

import pytest

from blueforty___etl_data_pipeline_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    select_agent,
)

ROBOTS = """\
# comment
User-agent: GPTBot
Disallow: /

User-agent: *
User-agent: research-bot
Disallow: /private/
Allow: /private/press/
Crawl-delay: 10

User-agent: nice-bot
Disallow:
"""


def test_parse_groups_and_sentinels():
    rules = set(parse_robots(ROBOTS))
    # multi-agent group expands to both agents; every agent with a
    # group gets the implicit length-0 allow sentinel
    assert ("*", 0, "/private/") in rules
    assert ("research-bot", 1, "/private/press/") in rules
    assert ("gptbot", 0, "/") in rules
    assert ("nice-bot", 1, "") in rules  # empty Disallow = allow-all
    assert ("nice-bot", 0, "") not in rules


def test_agent_selection_longest_token():
    rules = parse_robots(ROBOTS)
    assert select_agent(rules, "Research-Bot/1.0") == "research-bot"
    assert select_agent(rules, "GPTBot/2.1") == "gptbot"
    assert select_agent(rules, "randomcrawler") == "*"
    assert select_agent([], "anything") == ""


def test_decision_longest_prefix_allow_wins_ties():
    rules = parse_robots(ROBOTS)
    assert not robots_allowed(rules, "randomcrawler", "/private/data")
    assert robots_allowed(rules, "randomcrawler", "/private/press/x")
    assert robots_allowed(rules, "randomcrawler", "/public")
    assert not robots_allowed(rules, "GPTBot/2", "/anything")
    assert robots_allowed(rules, "nice-bot", "/private/data")
    # no robots.txt at all -> allowed
    assert robots_allowed(parse_robots(""), "x", "/y")
    # exact length tie: Allow beats Disallow
    tie = parse_robots(
        "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    )
    assert robots_allowed(tie, "x", "/a/page")


def test_wildcard_extension_gates():
    with pytest.raises(NotImplementedError, match="wildcard"):
        parse_robots("User-agent: *\nDisallow: /*.pdf$\n")


def test_rules_before_any_group_ignored():
    rules = parse_robots("Disallow: /x/\nUser-agent: *\nDisallow: /y/\n")
    assert ("*", 0, "/y/") in rules
    assert all(p != "/x/" for _a, _al, p in rules)


def test_robots_decisions_distributed(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.crawl import (
        robots_decisions,
    )

    robots = spark.createDataFrame(
        [
            ("a.com", ROBOTS),
            ("b.com", "User-agent: trainer-bot\nDisallow: /docs/\n"),
            # host with robots.txt but no matching group for us
            ("c.com", "User-agent: otherbot\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            ("a.com", "/private/data"),
            ("a.com", "/private/press/kit"),
            ("a.com", "/pub"),
            ("b.com", "/docs/1"),
            ("b.com", "/blog/1"),
            ("c.com", "/anything"),
            ("d.com", "/no/robots/at/all"),
        ],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): r["allowed"]
        for r in robots_decisions(
            pages, robots, agent="trainer-bot/1.0"
        ).collect()
    }
    assert got == {
        ("a.com", "/private/data"): False,
        ("a.com", "/private/press/kit"): True,
        ("a.com", "/pub"): True,
        ("b.com", "/docs/1"): False,
        ("b.com", "/blog/1"): True,
        ("c.com", "/anything"): True,
        ("d.com", "/no/robots/at/all"): True,
    }
    # scale contract: the page side must see a BROADCAST hash join,
    # not a shuffle exchange
    plan = (
        robots_decisions(pages, robots, agent="trainer-bot/1.0")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
