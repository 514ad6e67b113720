"""Crawl-governance operators: RFC 9309 robots.txt decisions at
corpus scale.

Scale shape (the part that matters at 100 TB): robots.txt rules are
HOST-cardinality data (millions of rows, each tiny) while pages are
corpus-cardinality (billions).  So the expensive side must never
shuffle: rules are parsed once (Arrow ``mapInPandas`` over the small
robots table), the governing agent group is selected per host with
small-side aggregations, the group's rules are folded into ONE array
row per host, and that array is BROADCAST-joined onto the page table
where the longest-prefix decision runs as a pure-codegen
``aggregate``/``filter`` higher-order fold — zero exchange on the
page side beyond the broadcast hash join.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_robots_rules(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → flat (host, rule_agent, is_allow, prefix)
    relation via the RFC 9309 parser in functions/robots.py —
    Arrow-batched, host-cardinality (small)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..functions.robots import parse_robots

        for pdf in batches:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                for agent, allow, prefix in parse_robots(txt):
                    rows.append((host, agent, allow, prefix))
            yield pd.DataFrame(
                rows,
                columns=[host_col, "rule_agent", "is_allow", "prefix"],
            )

    return robots.select(host_col, txt_col).mapInPandas(
        run,
        schema=(
            f"{host_col} string, rule_agent string, is_allow int, "
            "prefix string"
        ),
    )


def _governing_rules(
    rules: DataFrame, agent: str, host_col: str = "host"
) -> DataFrame:
    """Per host: the rule set of the group that governs ``agent``
    (longest product-token prefix match, else ``*``), folded to one
    array row — RFC 9309 §2.2.1 as two small-side aggregations."""
    agent_l = agent.lower()
    specific = (
        rules.filter(
            (F.col("rule_agent") != "*")
            & F.lit(agent_l).startswith(F.col("rule_agent"))
        )
        .groupBy(host_col)
        .agg(
            F.max_by(
                "rule_agent", F.length("rule_agent")
            ).alias("_specific")
        )
    )
    star = (
        rules.filter(F.col("rule_agent") == "*")
        .select(host_col)
        .distinct()
        .withColumn("_has_star", F.lit(True))
    )
    gov = (
        specific.join(star, host_col, "full")
        .select(
            host_col,
            F.coalesce(
                F.col("_specific"),
                F.when(F.col("_has_star"), F.lit("*")),
            ).alias("_gov"),
        )
        .filter(F.col("_gov").isNotNull())
    )
    return (
        rules.join(gov, host_col)
        .filter(F.col("rule_agent") == F.col("_gov"))
        .groupBy(host_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("is_allow").alias("allow"),
                    F.col("prefix").alias("prefix"),
                )
            ).alias("_rules")
        )
    )


def _decide(path: Column, rules_arr: Column) -> Column:
    """Longest-prefix decision as one codegen fold: scan the host's
    rules, keep the longest matching prefix (Allow wins length ties),
    start from the implicit allow at length -1.  NULL rules (host
    without a governing group) ⇒ allowed."""
    matching = F.filter(
        rules_arr, lambda r: path.startswith(r["prefix"])
    )
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).alias("len"), F.lit(1).alias("allow")
        ),
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > acc["len"])
            | (
                (F.length(r["prefix"]) == acc["len"])
                & (r["allow"] > acc["allow"])
            ),
            F.struct(
                F.length(r["prefix"]).alias("len"),
                r["allow"].alias("allow"),
            ),
        ).otherwise(acc),
    )
    return F.when(rules_arr.isNull(), True).otherwise(
        best["allow"] == 1
    )


def robots_decisions(
    pages: DataFrame,
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Annotate a page table with the RFC 9309 crawl decision for
    ``agent``: ``pages`` (host, path, …) × ``robots`` (host,
    robots_txt) → pages + boolean ``allowed``.  The robots side stays
    host-cardinality throughout and is broadcast; the page side never
    shuffles."""
    rules = parse_robots_rules(robots, host_col=host_col)
    per_host = _governing_rules(rules, agent, host_col=host_col)
    joined = pages.join(F.broadcast(per_host), host_col, "left")
    return joined.withColumn(
        "allowed", _decide(F.col(path_col), F.col("_rules"))
    ).drop("_rules")
