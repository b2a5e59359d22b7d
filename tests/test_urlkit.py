"""Canonicalization kernel vectors (SURVEY.md §2.3 C1–C5, FIXTURES.md §6).

Each vector is hand-derived from the reference's case ladder
(/root/reference/vendor/PHPCrawl_083/libs/Utils/PHPCrawlerUtils.class.php:
splitURL :27-106, buildURLFromParts :126-175, buildURLFromLink :234-328).
"""

from lightcrawler_spark.functions import urlkit
from lightcrawler_spark.functions.urlkit import (
    build_url_from_link,
    decode_html_entities,
    normalize_url,
    split_url,
    url_md5,
)

BASE = split_url("http://www.foo.com/dir/sub/index.html?x=1")


def resolve(link, base=None):
    return build_url_from_link(link, base or BASE)


class TestSplit:
    def test_basic(self):
        p = split_url("http://www.Foo.COM:8080/a/b/c.htm?q=1#frag")
        assert p.protocol == "http://"
        assert p.host == "www.foo.com"  # host lowercased
        assert p.port == 8080
        assert p.path == "/a/b/"
        assert p.file == "c.htm"
        assert p.query == "?q=1"
        assert p.domain == "foo.com"

    def test_scheme_case_preserved(self):
        # PHP parse_url keeps scheme case; normalize then treats it as a
        # non-http protocol for the port rule (quirk kept on purpose)
        p = split_url("HTTP://www.foo.com/")
        assert p.protocol == "HTTP://"
        assert p.port == 80  # strtolower() comparison sets the default

    def test_no_scheme_gets_http(self):
        p = split_url("www.foo.com/x.html")
        assert p.protocol == "http://"
        assert p.host == "www.foo.com"

    def test_domain_rules(self):
        assert split_url("http://foo.com/").domain == "foo.com"
        assert split_url("http://a.b.foo.com/").domain == "b.foo.com"
        assert split_url("http://127.0.0.1/").domain == "127.0.0.1"
        assert split_url("http://localhost/").domain == "localhost"

    def test_default_ports(self):
        assert split_url("http://h/").port == 80
        assert split_url("https://h/").port == 443
        assert split_url("ftp://h/").port == ""

    def test_empty_path_becomes_slash(self):
        assert split_url("http://h").path == "/"


class TestNormalize:
    def test_drops_default_port(self):
        assert normalize_url("http://www.foo.com:80/a.html") == "http://www.foo.com/a.html"
        assert normalize_url("https://foo.com:443/a") == "https://foo.com/a"

    def test_keeps_nondefault_port(self):
        assert normalize_url("http://foo.com:8080/a") == "http://foo.com:8080/a"

    def test_bare_root_loses_slash(self):
        assert normalize_url("http://www.foo.com/") == "http://www.foo.com"
        assert normalize_url("http://www.foo.com") == "http://www.foo.com"

    def test_root_with_query_keeps_slash(self):
        assert normalize_url("http://foo.com/?x=1") == "http://foo.com/?x=1"

    def test_auth_kept(self):
        assert normalize_url("http://u:p@foo.com/x") == "http://u:p@foo.com/x"

    def test_auth_needs_both(self):
        # reference requires username AND password non-empty
        assert normalize_url("http://u@foo.com/x") == "http://foo.com/x"

    def test_fragment_dropped(self):
        assert normalize_url("http://foo.com/x#y") == "http://foo.com/x"

    def test_host_lowercased_scheme_preserved(self):
        # uppercase scheme: not "http://" so the port is omitted by the
        # non-http rule; host still lowercased
        assert normalize_url("HTTP://WWW.FOO.COM/X") == "HTTP://www.foo.com/X"

    def test_none_on_garbage(self):
        assert normalize_url(None) is None


class TestResolve:
    def test_scheme_relative(self):
        assert resolve("//other.com/x.htm") == "http://other.com/x.htm"

    def test_root_relative(self):
        assert resolve("/a/b.htm") == "http://www.foo.com/a/b.htm"

    def test_dot_slash(self):
        assert resolve("./p.htm") == "http://www.foo.com/dir/sub/p.htm"

    def test_absolute(self):
        assert resolve("https://x.org:444/p?a=1") == "https://x.org:444/p?a=1"

    def test_absolute_default_port_normalized(self):
        assert resolve("http://x.org:80/p") == "http://x.org/p"

    def test_javascript_dropped(self):
        assert resolve("javascript:void(0)") is None
        assert resolve("mailto:a@b.com") is None

    def test_parent_pop(self):
        assert resolve("../p.htm") == "http://www.foo.com/dir/p.htm"
        assert resolve("../../p.htm") == "http://www.foo.com/p.htm"
        # popping past root stays at root
        assert resolve("../../../../p.htm") == "http://www.foo.com/p.htm"

    def test_fragment_only_dropped(self):
        assert resolve("#top") is None

    def test_query_only(self):
        assert resolve("?y=2") == "http://www.foo.com/dir/sub/index.html?y=2"

    def test_path_relative(self):
        assert resolve("p.htm") == "http://www.foo.com/dir/sub/p.htm"

    def test_fragment_stripped_from_last_hash(self):
        # greedy (.{1,})# strips from the LAST '#': 'p.htm#a' remains,
        # then normalize's splitURL drops the residual '#a' (splitURL
        # ignores the fragment part) — net result: no fragment at all.
        assert resolve("p.htm#a#b") == "http://www.foo.com/dir/sub/p.htm"

    def test_entities_decoded(self):
        assert resolve("p.htm?a=1&amp;b=2") == "http://www.foo.com/dir/sub/p.htm?a=1&b=2"
        assert resolve("p&#46;htm") == "http://www.foo.com/dir/sub/p.htm"

    def test_newlines_removed(self):
        assert resolve("p\n.htm") == "http://www.foo.com/dir/sub/p.htm"

    def test_resolved_gets_normalized_port(self):
        # the ladder inserts ':80' explicitly and normalize strips it
        assert resolve("/x") == "http://www.foo.com/x"

    def test_nondefault_base_port_kept(self):
        base = split_url("http://h.example.com:8080/d/")
        assert build_url_from_link("/x", base) == "http://h.example.com:8080/x"

    def test_single_slash_scheme_dropped(self):
        # 'http:/foo' (single slash) hits the scheme:-drop case
        assert resolve("http:/foo") is None


class TestEntities:
    def test_named(self):
        assert decode_html_entities("a&amp;b&lt;c&gt;d&quot;e&nbsp;f") == 'a&b<c>d"e f'

    def test_numeric_mod256(self):
        assert decode_html_entities("&#64;") == "@"
        assert decode_html_entities("&#320;") == "@"  # PHP chr wraps mod 256

    def test_hex(self):
        assert decode_html_entities("&#x2f;") == "/"

    def test_case_insensitive(self):
        assert decode_html_entities("&AMP;") == "&"


def test_url_md5_matches_reference_key():
    # md5 of the canonical URL, lowercase hex (PHPCrawlerURLCacheBase:85-93)
    assert url_md5("http://www.foo.com") == "2af57e5b59a40b4e5ca26698e98a05e2"
    assert len(url_md5("x")) == 32


def test_idempotent_normalization():
    urls = [
        "http://www.foo.com/a/b.htm?x=1",
        "http://foo.com:8080/",
        "https://a.b.c.d/e/../f",  # normalize does NOT resolve dots
    ]
    for u in urls:
        once = normalize_url(u)
        assert normalize_url(once) == once


class TestFormatUrlC4:
    """Formatter::formaturl quirks (libs/Formatter.class.php:11-60)."""

    def test_passthrough_http_ftp_only(self):
        from lightcrawler_spark.functions.urlkit import format_url

        assert format_url("http://h/a/b.htm", "http://x/y") == "http://x/y"
        assert format_url("http://h/a/b.htm", "ftp://x/y") == "ftp://x/y"
        # https is NOT in the passthrough list → resolves as relative
        assert (
            format_url("http://h/a/b.htm", "https://x/y")
            == "http://h/a/https://x/y"
        )

    def test_relative_and_root_relative(self):
        from lightcrawler_spark.functions.urlkit import format_url

        assert format_url("http://h/a/b/c.htm", "x.htm") == "http://h/a/b/x.htm"
        assert format_url("http://h/a/b/c.htm", "/r.htm") == "http://h/r.htm"
        # port is dropped in every resolved form
        assert format_url("http://h:8080/a/c.htm", "/x") == "http://h/x"
        assert format_url("http://h:8080/a/c.htm", "x") == "http://h/a/x"

    def test_backslash_and_dotdot(self):
        from lightcrawler_spark.functions.urlkit import format_url

        assert (
            format_url("http://h/a/b/c.htm", "..\\up.htm")
            == "http://h/a/up.htm"
        )
        assert (
            format_url("http://h/a/b/c/d.htm", "../../x.htm")
            == "http://h/a/x.htm"
        )

    def test_empty_base_and_missing_host(self):
        from lightcrawler_spark.functions.urlkit import format_url

        assert format_url(None, "x.htm") == "x.htm"
        assert format_url("", "x.htm") == "x.htm"
        assert format_url("nota url", "x.htm") is None
