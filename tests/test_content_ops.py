"""Content-extraction operators (SURVEY.md §2.4 E7–E16, §2.3 C6–C8,
E19, S9, P12): semantics parity with the reference's extractor on
hand-built vectors."""

import datetime

import pytest
from pyspark.sql import functions as F


class TestJvmExpressions:
    def test_unify_publish_time(self, spark):
        from lightcrawler_spark.operators.content import unify_publish_time

        rows = spark.createDataFrame(
            [("2017年5月1日",), ("2017-5-1",), ("2017年12月31日起",),
             ("no date",), ("",)],
            "s string",
        ).select(unify_publish_time(F.col("s")).alias("d")).collect()
        assert rows[0]["d"] == datetime.date(2017, 5, 1)
        assert rows[1]["d"] == datetime.date(2017, 5, 1)
        assert rows[2]["d"] == datetime.date(2017, 12, 31)
        assert rows[3]["d"] is None
        assert rows[4]["d"] is None

    def test_unify_doc_ori_no(self, spark):
        from lightcrawler_spark.operators.content import unify_doc_ori_no

        rows = spark.createDataFrame(
            [("京政发〔2023〕第12号",), ("财政部（2020）3号",),
             ("国发[1999]第7号",), ("not a doc no",)],
            "s string",
        ).select(unify_doc_ori_no(F.col("s")).alias("n")).collect()
        assert rows[0]["n"] == "京政发(2023)12号"
        assert rows[1]["n"] == "财政部(2020)3号"
        assert rows[2]["n"] == "国发(1999)7号"
        assert rows[3]["n"] == "not a doc no"  # pass-through

    def test_title_guess(self, spark):
        from lightcrawler_spark.operators.content import title_guess

        rows = spark.createDataFrame(
            [("关于促进消费的意见_政策文件_政府网",),
             ("Annual Report - Acme Corp",), ("Plain Title",)],
            "t string",
        ).select(title_guess(F.col("t")).alias("g")).collect()
        assert rows[0]["g"] == "关于促进消费的意见"
        assert rows[1]["g"] == "Annual Report"
        assert rows[2]["g"] == "Plain Title"

    def test_t_valid(self, spark):
        from lightcrawler_spark.operators.content import t_valid_date

        rows = spark.createDataFrame(
            [("本办法自2017年5月1日起施行。",), ("nothing here",)], "s string"
        ).select(t_valid_date(F.col("s")).alias("d")).collect()
        assert rows[0]["d"] == datetime.date(2017, 5, 1)
        assert rows[1]["d"] is None

    def test_negs(self, spark):
        from lightcrawler_spark.operators.content import negs_list

        rows = spark.createDataFrame(
            [("依据《中华人民共和国证券法》和《公司法》以及《证券法》规定",)],
            "s string",
        ).select(negs_list(F.col("s")).alias("n")).collect()
        assert rows[0]["n"] == ["中华人民共和国证券法", "公司法", "证券法"]

    def test_index_block_filter(self, spark):
        from lightcrawler_spark.operators.content import index_block_filter

        df = spark.createDataFrame(
            [("索引号：ABC-123",), ("发文机关:财政部",),
             ("这是一行很长的正文内容不是元数据行因为超过八个字符",),
             ("正文。",), ("  标 题：某文件  ",)],
            "line string",
        )
        kept = [r["line"] for r in index_block_filter(df).collect()]
        assert "索引号：ABC-123" in kept
        assert "发文机关:财政部" in kept
        assert "标题：某文件" in kept  # whitespace stripped first
        assert len(kept) == 3

    def test_attachment_harvest_and_type(self, spark):
        from lightcrawler_spark.operators.content import (
            attachment_type_code, harvest_attachments,
        )

        body = (
            '<a href="/files/通知【2023】.pdf">附件</a>'
            '<a href="/files/表格.xls">x</a>'
            '<a href="/page.htm">nav</a>'
            '<img src="/userfiles/image/123.jpg"/>'
            '<img src="/other/45.png"/>'
        )
        df = spark.createDataFrame([("http://a.test/p1", body)],
                                   "url string, body_text string")
        rows = harvest_attachments(df).collect()
        got = {(r["att_url"], r["kind"]) for r in rows}
        assert ("/files/通知【2023】.pdf", "attachment") in got
        assert ("/files/表格.xls", "attachment") in got
        assert ("/userfiles/image/123.jpg", "image") in got
        assert len(got) == 3

        codes = spark.createDataFrame(
            [("a.pdf",), ("b.doc",), ("c.htm",), ("d.xlsx",), ("e",)],
            "u string",
        ).select(attachment_type_code(F.col("u")).alias("c")).collect()
        assert [r["c"] for r in codes] == [8, 4, 1, 7, 1]


class TestHtmlKernel:
    HTML = (
        "<html><head><title>文件标题_站点</title>"
        "<script>var x = '<div>junk</div>';</script></head><body>"
        "<h1>大标题</h1>"
        "<div>导航</div>"
        "<table><tr><td>索引号</td><td>GOV-1</td></tr>"
        "<tr><td>发文日期</td><td>2020年1月2日</td></tr></table>"
        "<p>第一段正文。</p><p>第二段正文，引用《某法》。</p>"
        '<p><img src="/userfiles/image/9.jpg"/></p>'
        "</body></html>"
    )

    def test_to_text_struct(self):
        from lightcrawler_spark.operators.content import html_text_struct

        s = html_text_struct(self.HTML, keep_img=True)
        assert s["page_title"] == "文件标题_站点"
        assert "大标题" in s["title_candidates"]
        assert "junk" not in s["text"]                      # E8 script strip
        assert "索引号|GOV-1|" in s["text"].replace("\n", "")  # td cell bars
        assert "第一段正文。" in s["text_p"][0]
        assert "[tag:img:/userfiles/image/9.jpg]" in s["text"]  # E7 keep_img
        assert s["images"] == ["/userfiles/image/9.jpg"]
        # E10: paragraph ratio >= 0.01 → textP wins
        assert "第一段正文。" in s["content"]

    NAV = (
        '<div id="nav"><ul>'
        '<li><a href="/1">首页</a></li>'
        '<li><a href="/2">新闻中心</a></li>'
        '<li><a href="/3">政策</a></li>'
        "</ul></div>"
    )

    def test_link_block_pruning_e9(self):
        from lightcrawler_spark.operators.content import (
            html_text_struct,
            prune_link_blocks,
        )

        html = self.HTML.replace("<body>", "<body>" + self.NAV)
        # nav block: anchor ratio 1.0 > 0.6, avg len int(8/3)=2 ∈ (1,6) → pruned
        pruned = prune_link_blocks(html)
        assert "首页" not in pruned and "新闻中心" not in pruned
        assert "第一段正文。" in pruned          # content untouched
        s = html_text_struct(html, keep_img=True)
        assert "首页" not in s["text"]

        # long anchors (avg ≥ 6) survive: a real content list, not a nav
        content_list = (
            '<div><a href="/a">这是一条很长的正文链接标题文字</a></div>'
        )
        kept = prune_link_blocks("<body>" + content_list + "</body>")
        assert "这是一条很长的正文链接标题文字" in kept

        # anchor-light block survives (ratio ≤ 0.6)
        mixed = (
            '<div>大量正文内容不是链接大量正文内容不是链接'
            '<a href="/x">链接</a></div>'
        )
        assert "链接" in prune_link_blocks("<body>" + mixed + "</body>")

        # outer block evaluated first on the INTACT tree: outer dense nav
        # containing an inner div is removed whole
        nested = (
            '<div><div><a href="/1">首页</a><a href="/2">新闻</a></div>'
            '<a href="/3">政策</a></div>'
        )
        out = prune_link_blocks("<body>" + nested + "x</body>")
        assert "首页" not in out and "政策" not in out and "x" in out

    def test_main_content_density_path(self):
        from lightcrawler_spark.operators.content import main_content

        # no <p> text at all → line-block density picks the longest run
        text = "\n".join(
            ["nav", "", "", "这是正文第一行内容比较长", "这是正文第二行内容也比较长",
             "这是正文第三行内容同样比较长", "", "", "footer"]
        )
        got = main_content(text, [])
        assert "正文第一行" in got and "正文第三行" in got
        assert "nav" not in got or "footer" not in got

    def test_udf_roundtrip(self, spark):
        from lightcrawler_spark.operators.content import html_to_text_udf

        df = spark.createDataFrame([(self.HTML,)], "body string")
        row = df.select(html_to_text_udf(F.col("body")).alias("s")).collect()[0]["s"]
        assert row["page_title"] == "文件标题_站点"
        assert row["images"] == ["/userfiles/image/9.jpg"]

    def test_summary_fields(self, spark):
        from lightcrawler_spark.operators.content import extract_summary_udf

        text = "索引号：GOV-1\n发文机关:财政部\n发文日期：2020年1月2日\n正文开始了。"
        df = spark.createDataFrame([(text,)], "t string")
        row = df.select(extract_summary_udf(F.col("t")).alias("s")).collect()[0]["s"]
        assert row["index_ori_no"] == "GOV-1"
        assert row["author"] == "财政部"
        assert row["publish_time"] == "2020年1月2日"

    def test_charset_decode(self, spark):
        from lightcrawler_spark.operators.content import decode_charset_udf

        gbk_html = "<meta charset=gbk><p>你好世界</p>".encode("gbk")
        utf8_html = "<p>héllo</p>".encode("utf-8")
        df = spark.createDataFrame(
            [(bytearray(gbk_html), None), (bytearray(utf8_html), None),
             (bytearray("纯文本".encode("gb2312")), "gb2312")],
            "body binary, hdr string",
        )
        rows = df.select(
            decode_charset_udf(F.col("body"), F.col("hdr")).alias("t")
        ).collect()
        assert "你好世界" in rows[0]["t"]
        assert "héllo" in rows[1]["t"]
        assert rows[2]["t"] == "纯文本"


class TestProductsAndCookies:
    def test_dedup_products_four_keys(self, spark):
        from lightcrawler_spark.operators.products import (
            clamp_product_fields, dedup_products_against,
        )

        existing = spark.createDataFrame(
            [("m1", "国发(2020)1号", "d1", 111),
             ("m2", "", "d2", 222)],
            "url_md5 string, doc_ori_no string, doc_id string, simhash long",
        )
        new = spark.createDataFrame(
            [("m1", "x", "dx", 1),        # dup by url_md5
             ("m9", "国发(2020)1号", "dy", 2),  # dup by doc_ori_no
             ("m8", "y", "d2", 3),        # dup by doc_id
             ("m7", "z", "dz", 222),      # dup by simhash
             ("m6", "", "dq", 999),       # fresh (empty doc_ori_no ≠ "" match)
             ],
            "url_md5 string, doc_ori_no string, doc_id string, simhash long",
        )
        out = dedup_products_against(new, existing).collect()
        assert {r["url_md5"] for r in out} == {"m6"}

        clamped = clamp_product_fields(
            spark.createDataFrame([("t" * 600,)], "title string")
        ).collect()
        assert len(clamped[0]["title"]) == 512

    def test_requeue_list_pages(self, spark):
        from lightcrawler_spark.operators.products import requeue_list_pages

        rows = [(i, "list" if i < 30 else "detail") for i in range(40)]
        df = spark.createDataFrame(rows, "insert_seq long, route string")
        out = requeue_list_pages(df, max_pages=5).collect()
        assert [r["insert_seq"] for r in out] == [0, 3, 6, 9, 12]
        assert all(r["state"] == "pending" for r in out)

    def test_cookie_lookup(self, spark):
        from lightcrawler_spark.operators.cookies import (
            cookies_for_requests, upsert_cookies,
        )

        jar = spark.createDataFrame(
            [(1, "acme.com", "acme.com", "/", "sid", "old"),
             (2, "acme.com", "acme.com", "/", "sid", "new"),       # shadows 1
             (3, "acme.com", "shop.acme.com", "/cart", "basket", "b1"),
             (4, "other.com", "other.com", "/", "tok", "t")],
            "seq long, source_domain string, domain string, path string, "
            "name string, value string",
        )
        jar = upsert_cookies(None, jar)
        assert jar.count() == 3  # seq-1 row replaced

        reqs = spark.createDataFrame(
            [("http://shop.acme.com/cart/item", "acme.com", "shop.acme.com", "/cart/item"),
             ("http://www.acme.com/", "acme.com", "www.acme.com", "/"),
             ("http://nomatch.test/", "nomatch.test", "nomatch.test", "/")],
            "url string, domain string, host string, path string",
        )
        got = {
            (r["url"], r["name"]): r["value"]
            for r in cookies_for_requests(reqs, jar).collect()
        }
        # tail-match + path-prefix: cart page gets both cookies
        assert got[("http://shop.acme.com/cart/item", "sid")] == "new"
        assert got[("http://shop.acme.com/cart/item", "basket")] == "b1"
        # www host tail-matches acme.com but not shop.acme.com's path scope
        assert got[("http://www.acme.com/", "sid")] == "new"
        assert ("http://www.acme.com/", "basket") not in got
        assert not any(u.startswith("http://nomatch") for (u, _) in got)
