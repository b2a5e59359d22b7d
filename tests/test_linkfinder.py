"""Link-finder kernel tests (SURVEY.md §2.4 E1–E6, E17).

Behavior vectors derived from the reference regex passes
(/root/reference/vendor/PHPCrawl_083/libs/PHPCrawlerLinkFinder.class.php:140-239).
"""

from lightcrawler_spark.operators.extract import (
    base_url_from_meta,
    extract_meta_tags,
    find_links,
    redirect_url_from_header,
)

BASE = "http://www.foo.com/dir/index.html"


def urls(html, **kw):
    return [l["url"] for l in find_links(html, BASE, **kw)]


class TestPass1:
    def test_wellformed_anchor_with_linktext(self):
        html = '<a href="page.htm">Click here</a>'
        links = find_links(html, BASE)
        assert links[0]["url"] == "http://www.foo.com/dir/page.htm"
        assert links[0]["linktext"] == "Click here"
        assert links[0]["link_raw"] == "page.htm"
        assert "<a href=" in links[0]["linkcode"]

    def test_single_quotes_and_unquoted(self):
        assert urls("<a href='a.htm'>x</a>") == ["http://www.foo.com/dir/a.htm"]
        assert urls("<a href=b.htm>x</a>") == ["http://www.foo.com/dir/b.htm"]

    def test_linktext_capped_at_500(self):
        long_text = "y" * 600
        links = find_links(f'<a href="a.htm">{long_text}</a>', BASE)
        # the 500-char tempered-dot cap means the well-formed pass does
        # NOT match; pass 2 still picks the href up with empty linktext
        assert links[0]["linktext"] == ""

    def test_whitespace_variants(self):
        assert urls('< a  href = "a.htm" >x</ a >') == [
            "http://www.foo.com/dir/a.htm"
        ]


class TestPass2:
    def test_img_src(self):
        assert urls('<img src="pic.png">') == ["http://www.foo.com/dir/pic.png"]

    def test_form_action(self):
        assert urls('<form action="/post.php" method="x">') == [
            "http://www.foo.com/post.php"
        ]

    def test_frame_and_other_tags(self):
        html = '<frame src="f.htm"><link href="s.css">'
        assert set(urls(html)) == {
            "http://www.foo.com/dir/f.htm",
            "http://www.foo.com/dir/s.css",
        }


class TestAggressive:
    def test_css_url_call(self):
        html = 'x background: url("bg.gif") y'
        assert urls(html, aggressive=True) == ["http://www.foo.com/dir/bg.gif"]

    def test_bare_attr_like(self):
        html = " href=deep.htm "
        assert urls(html, aggressive=True) == ["http://www.foo.com/dir/deep.htm"]

    def test_off_by_default(self):
        assert urls(" href=deep.htm ") == []


class TestDedupOrder:
    def test_first_wins_per_raw_link(self):
        html = '<a href="a.htm">first</a><a href="a.htm">second</a>'
        links = find_links(html, BASE)
        assert len(links) == 1
        assert links[0]["linktext"] == "first"

    def test_order_is_pass_then_position(self):
        html = '<img src="z.png"><a href="a.htm">t</a>'
        got = urls(html)
        # pass 1 (anchors) runs before pass 2 (attrs) regardless of position
        assert got == [
            "http://www.foo.com/dir/a.htm",
            "http://www.foo.com/dir/z.png",
        ]

    def test_same_url_different_raw_kept_once_each(self):
        # dedup key is the RAW link, not the rebuilt URL (reference quirk)
        html = '<a href="a.htm">x</a><a href="./a.htm">y</a>'
        links = find_links(html, BASE)
        assert len(links) == 2
        assert links[0]["url"] == links[1]["url"]


class TestSections:
    def test_script_section_stripped(self):
        html = '<script>var x="in_script.htm";</script><a href="a.htm">x</a>'
        got = urls(html, aggressive=True)
        assert got == ["http://www.foo.com/dir/a.htm"]

    def test_comment_stripped(self):
        html = '<!-- <a href="c.htm">x</a> --><a href="a.htm">x</a>'
        assert urls(html) == ["http://www.foo.com/dir/a.htm"]

    def test_onclick_stripped(self):
        html = '<div onclick="location=\'j.htm\'"></div><a href="a.htm">x</a>'
        assert urls(html) == ["http://www.foo.com/dir/a.htm"]


class TestBaseTag:
    def test_base_href_rebases(self):
        html = '<base href="http://cdn.foo.com/assets/"><a href="a.htm">x</a>'
        # the <base> tag itself is also harvested by pass 2 (it carries an
        # href attribute and stays in the source) — reference does the same
        assert urls(html) == [
            "http://cdn.foo.com/assets/a.htm",
            "http://cdn.foo.com/assets/",
        ]


class TestMetaAndRedirect:
    def test_meta_tags(self):
        html = '<meta name="robots" content="NOFOLLOW"><meta name="a" content="B">'
        tags = extract_meta_tags(html)
        assert tags["robots"] == "nofollow"
        assert tags["a"] == "b"

    def test_redirect_from_header(self):
        hdr = "HTTP/1.1 301 Moved\nLocation: http://foo.com/new\nServer: x\n"
        assert redirect_url_from_header(hdr) == "http://foo.com/new"

    def test_redirect_link_comes_first_and_flagged(self):
        links = find_links('<a href="a.htm">x</a>', BASE,
                           redirect_location="/moved.htm")
        assert links[0]["is_redirect"] is True
        assert links[0]["url"] == "http://www.foo.com/moved.htm"
        assert links[1]["is_redirect"] is False

    def test_base_url_from_meta(self):
        assert base_url_from_meta('<base href="/x/">') == "/x/"


def test_javascript_links_dropped_but_counted_in_dedup():
    html = '<a href="javascript:void(0)">x</a><a href="a.htm">y</a>'
    links = find_links(html, BASE)
    assert [l["url"] for l in links] == ["http://www.foo.com/dir/a.htm"]
