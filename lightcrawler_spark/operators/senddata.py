"""Per-URL POST/auth injection (SURVEY.md §2.5 P13).

Reference: regex-matched post-data and basic-auth rules attached to each
request before fetch (/root/reference/vendor/PHPCrawl_083/libs/
PHPCrawlerUserSendDataCache.class.php:32-54,63-70; wiring
PHPCrawler.class.php:718-733). The reference scans its rule list in
registration order; post-data fields accumulate into one assoc array
(``$post_data_array[key] = value`` — later rules OVERWRITE earlier
values for the same key while the key keeps its first-occurrence
position), and auth is first-match-wins.

Spark rebuild: the rule table is tiny — broadcast it, rlike-join against
the work-list, rank by rule order. The key-wise merge is a pure JVM
``aggregate`` over the exploded ``k=v`` entries (no Python): PHP-exact
first-occurrence key order with last-wins values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["attach_send_data", "merge_post_payloads"]


def _entry_key(e: Column) -> Column:
    return F.substring_index(e, "=", 1)


def _entry_val(e: Column) -> Column:
    return F.regexp_replace(e, "^[^=]*=", "")


def merge_post_payloads(payloads_in_order: Column) -> Column:
    """array<string> of ``k=v&k2=v2`` payloads (already in rule order) →
    one merged payload string with PHP assoc-array semantics: key keeps
    the position of its first occurrence, value is the last assignment.
    """
    entries = F.flatten(
        F.transform(payloads_in_order, lambda p: F.split(p, "&"))
    )
    merged = F.aggregate(
        entries,
        F.expr("cast(map() as map<string,string>)"),
        lambda acc, e: F.when(
            F.map_contains_key(acc, _entry_key(e)),
            F.transform_values(
                acc,
                lambda k, v: F.when(k == _entry_key(e), _entry_val(e)).otherwise(v),
            ),
        ).otherwise(F.map_concat(acc, F.create_map(_entry_key(e), _entry_val(e)))),
    )
    return F.concat_ws(
        "&",
        F.transform(
            F.map_entries(merged),
            lambda kv: F.concat(kv["key"], F.lit("="), kv["value"]),
        ),
    )


def attach_send_data(work: DataFrame, rules: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """rules: (rule_order long, url_regex string, kind string
    ('post'|'auth'), payload string). Returns work + post_data (the
    matching post rules' fields merged key-wise, later rules winning on
    collision) + auth (first match)."""
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
            merge_post_payloads(
                F.array_sort(F.collect_list(
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
