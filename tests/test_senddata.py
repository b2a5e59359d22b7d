"""P13: per-URL POST/auth rule attachment."""


def test_attach_send_data(spark):
    from lightcrawler_spark.operators.senddata import attach_send_data

    work = spark.createDataFrame(
        [("http://a.test/search/1",), ("http://a.test/login/2",),
         ("http://a.test/plain/3",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            (1, "/search/", "post", "q=x"),
            (2, "/search/", "post", "lang=zh"),
            (3, "/(search|login)/", "auth", "u:p1"),
            (4, "/login/", "auth", "u:p2"),
        ],
        "rule_order long, url_regex string, kind string, payload string",
    )
    got = {r["url"]: r for r in attach_send_data(work, rules).collect()}
    # all matching post rules merge in rule order
    assert got["http://a.test/search/1"]["post_data"] == "q=x&lang=zh"
    # first matching auth rule wins
    assert got["http://a.test/search/1"]["auth"] == "u:p1"
    assert got["http://a.test/login/2"]["auth"] == "u:p1"
    assert got["http://a.test/login/2"]["post_data"] is None
    # non-matching rows pass through with nulls
    assert got["http://a.test/plain/3"]["post_data"] is None
    assert got["http://a.test/plain/3"]["auth"] is None
