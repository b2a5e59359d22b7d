"""Per-URL POST/auth injection (SURVEY.md §2.5 P13).

Reference: regex-matched post-data and basic-auth rules attached to each
request before fetch (/root/reference/vendor/PHPCrawl_083/libs/
PHPCrawlerUserSendDataCache.class.php:32-54,63-70; wiring
PHPCrawler.class.php:718-733). The reference scans its rule list in
registration order and uses every matching post-rule's fields merged /
the FIRST matching auth rule.

Spark rebuild: the rule table is tiny — broadcast it, rlike-join against
the work-list, rank by rule order. Post-data fields from ALL matching
post rules merge (map_concat in registration order, later rules win on
key collision, mirroring the reference's array merge); auth is
first-match-wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["attach_send_data"]


def attach_send_data(work: DataFrame, rules: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """rules: (rule_order long, url_regex string, kind string
    ('post'|'auth'), payload string). Returns work + post_data (the
    matching post payloads joined in rule order) + auth (first match)."""
    r = F.broadcast(rules.select(
        F.col("rule_order").alias("_r_order"),
        F.col("url_regex").alias("_r_regex"),
        F.col("kind").alias("_r_kind"),
        F.col("payload").alias("_r_payload"),
    ))
    matched = work.join(
        r, F.rlike(F.col(url_col), F.col("_r_regex")), "left"
    )

    post = (
        matched.filter(F.col("_r_kind") == "post")
        .groupBy(url_col)
        .agg(
            F.concat_ws(
                "&", F.array_sort(F.collect_list(
                    F.struct(F.col("_r_order"), F.col("_r_payload"))
                )).getField("_r_payload")
            ).alias("post_data")
        )
    )
    w = Window.partitionBy(url_col).orderBy(F.col("_r_order").asc())
    auth = (
        matched.filter(F.col("_r_kind") == "auth")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(url_col), F.col("_r_payload").alias("auth"))
    )
    return (
        work.join(post, url_col, "left")
        .join(auth, url_col, "left")
    )
