"""URL canonicalization kernel (SURVEY.md §2.3 C1–C5).

Re-implements, from observed behavior, the reference's URL handling:

- ``split_url``            ~ PHPCrawlerUtils::splitURL
                             (/root/reference/vendor/PHPCrawl_083/libs/Utils/PHPCrawlerUtils.class.php:27-106)
- ``build_url_from_parts`` ~ PHPCrawlerUtils::buildURLFromParts (:126-175)
- ``normalize_url``        ~ PHPCrawlerUtils::normalizeURL (:185-193)
- ``build_url_from_link``  ~ PHPCrawlerUtils::buildURLFromLink (:234-328)
- ``decode_html_entities`` ~ PHPCrawlerEncodingUtils::decodeHtmlEntities
                             (libs/Utils/PHPCrawlerEncodingUtils.class.php:60-95)
- ``url_md5``              ~ dedup key md5(url_rebuild)
                             (libs/UrlCache/PHPCrawlerURLCacheBase.class.php:85-93)

These functions define the **seen-set key**: the engine's dedup, golden
traces and frontier state all hash the output of this module, so the
semantics below intentionally preserve the reference's quirks:

* host is lowercased, scheme case is PRESERVED (PHP parse_url keeps it);
  an uppercase scheme therefore skips default-port stripping's http match
  but is still rendered portless because non-"http://"/"https://"
  protocols never get a port in normalized output.
* default ports (80/443) are dropped on normalize; NON-default ports are
  kept (http://h:8080/x stays).
* a path of exactly "/" with no file and no query renders as "" →
  ``http://host/`` normalizes to ``http://host``.
* fragment is stripped from the LAST ``#`` (greedy), but a link that
  STARTS with ``#`` is dropped entirely.
* ``scheme:...`` links without ``://`` (javascript:, mailto:) are dropped.
* the limited HTML-entity table + mod-256 numeric character references
  are applied to raw links before resolution.
* domain := host minus its first label when the host has >2 labels and is
  not an all-digit IPv4; otherwise domain == host.

Everything is pure Python (no Spark imports) so the same kernel runs in
driver-side simulators, pandas-UDF batches, and unit tests.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

__all__ = [
    "UrlParts",
    "split_url",
    "build_url_from_parts",
    "normalize_url",
    "build_url_from_link",
    "decode_html_entities",
    "url_md5",
    "format_url",
]

_SCHEME_RE = re.compile(r"^[a-z0-9-]+://", re.I)
# scheme://[user[:pass]@]host[:port][/path][?query][#fragment]
_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z0-9+.-]+)://"
    r"(?:(?P<user>[^:@/?#]*)(?::(?P<pass>[^@/?#]*))?@)?"
    r"(?P<host>[^:/?#]*)"
    r"(?::(?P<port>\d*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$",
    re.S,
)
_FILE_SPLIT_RE = re.compile(r"^(.*/)([^/]*)$", re.S)
_IP_RE = re.compile(r"^[0-9]+$")

# --- decode_html_entities ------------------------------------------------
_NAMED_ENTITIES = [
    (re.compile(r"&(quot|#34);", re.I), '"'),
    (re.compile(r"&(amp|#38);", re.I), "&"),
    (re.compile(r"&(lt|#60);", re.I), "<"),
    (re.compile(r"&(gt|#62);", re.I), ">"),
    (re.compile(r"&(nbsp|#160);", re.I), " "),
    (re.compile(r"&(iexcl|#161);", re.I), chr(161)),
    (re.compile(r"&(cent|#162);", re.I), chr(162)),
    (re.compile(r"&(pound|#163);", re.I), chr(163)),
    (re.compile(r"&(copy|#169);", re.I), chr(169)),
]
_NUM_REF_RE = re.compile(r"&#([0-9]{1,4});", re.I)
_HEX_REF_RE = re.compile(r"&#x([0-9a-z]{2,4});", re.I)


def decode_html_entities(s: str) -> str:
    """Limited entity decoding with the reference's table + mod-256 refs."""
    for pat, rep in _NAMED_ENTITIES:
        s = pat.sub(rep, s)
    # PHP chr() wraps modulo 256; mirror that (codepoint semantics for the
    # resulting char — ASCII range matches byte semantics exactly).
    s = _NUM_REF_RE.sub(lambda m: chr(int(m.group(1)) % 256), s)
    s = _HEX_REF_RE.sub(lambda m: chr(int(m.group(1), 16) % 256), s)
    return s


@dataclass
class UrlParts:
    protocol: str  # includes trailing '://', e.g. 'http://'
    host: str      # lowercased
    path: str      # directory part, ends with '/' (or '' pre-default)
    file: str
    query: str     # includes leading '?' when present, else ''
    domain: str
    port: object   # int or '' (unparseable/missing for exotic schemes)
    auth_username: str = ""
    auth_password: str = ""


def split_url(url: str) -> UrlParts | None:
    """Split a URL into parts with the reference's defaulting rules."""
    if url is None:
        return None
    if not _SCHEME_RE.match(url):
        url = "http://" + url
    m = _URL_RE.match(url)
    if m is None:
        return None
    protocol = m.group("scheme") + "://"
    host = (m.group("host") or "").lower()
    path = m.group("path") or ""
    # a non-empty path not starting with '/' can only arise from a
    # malformed authority (e.g. "http://h:junk" — non-numeric port). PHP
    # parse_url returns false there (the reference's splitURL source),
    # and rebuilding such parts would glue host+path into a DIFFERENT
    # url, breaking normalize idempotence → reject like parse_url does.
    if path and not path.startswith("/"):
        return None
    # '@' can never appear in a real host — it arises only when an empty
    # userinfo consumed the first '@' of a malformed authority like
    # "http://@@" (host='@'). Rebuilding would drop the empty userinfo
    # and yield "http://@", which re-splits to host='' → normalize would
    # not be idempotent (found by the hypothesis fuzz suite). PHP
    # parse_url also returns false for these.
    if "@" in host:
        return None
    query = ("?" + m.group("query")) if m.group("query") is not None else ""
    port: object = m.group("port") or ""
    user = m.group("user") or ""
    password = m.group("pass") or ""

    fm = _FILE_SPLIT_RE.match(path)
    if fm is not None:
        file = fm.group(2).strip()
        path = fm.group(1).strip()
    else:
        # no '/' in path at all → whole thing is... per reference regex,
        # a path like 'abc' has no match → file stays ''. (Can only occur
        # for exotic inputs; http URLs always start the path with '/').
        file = ""

    labels = host.split(".")
    if len(labels) <= 2:
        domain = host
    elif _IP_RE.match(host.replace(".", "")):
        domain = host
    else:
        domain = host[host.find(".") + 1:]

    if port == "":
        if protocol.lower() == "http://":
            port = 80
        elif protocol.lower() == "https://":
            port = 443
    else:
        port = int(port)

    if path == "":
        path = "/"

    return UrlParts(
        protocol=protocol, host=host, path=path, file=file, query=query,
        domain=domain, port=port, auth_username=user, auth_password=password,
    )


def build_url_from_parts(p: UrlParts, normalize: bool = False) -> str:
    """Rebuild a URL; with normalize=True drops default/non-http ports."""
    protocol = p.protocol or "http://"
    auth_part = ""
    if p.auth_username != "" and p.auth_password != "":
        auth_part = f"{p.auth_username}:{p.auth_password}@"
    port_part = f":{p.port}"
    if normalize:
        if (protocol == "http://" and p.port == 80) or (
            protocol == "https://" and p.port == 443
        ):
            port_part = ""
        if protocol != "http://" and protocol != "https://":
            port_part = ""
    path = p.path
    if path == "/" and p.file == "" and p.query == "":
        path = ""
    return f"{protocol}{auth_part}{p.host}{port_part}{path}{p.file}{p.query}"


def normalize_url(url: str) -> str | None:
    p = split_url(url)
    if p is None or p.host == "":
        return None
    return build_url_from_parts(p, normalize=True)


# PCRE default: '.' does not match newlines — keep that (raw links with
# embedded newlines keep their fragment until the \n strip, like the ref).
_ANCHOR_RE = re.compile(r"^(.{1,})#.{0,}$")
_ABS_SCHEME_RE = re.compile(r"^[a-z0-9-]{1,}(://)", re.I)
_OTHER_SCHEME_RE = re.compile(r"^[a-zA-Z]{0,}:[^/]{0,1}")
_POP_SEGMENT_RE = re.compile(r"/[^/]{0,}/$")


def build_url_from_link(link: str, base: UrlParts) -> str | None:
    """Resolve a raw link against base parts → normalized absolute URL.

    Mirrors the reference's case ladder exactly (including the greedy
    last-'#' fragment strip and the drop of non-'://' scheme links).
    Returns None when the link is dropped or unresolvable.
    """
    if link is None:
        return None
    link = decode_html_entities(link)
    # strip fragment: everything from the LAST '#', but only when '#' is
    # not the first character
    link = _ANCHOR_RE.sub(r"\1", link)

    base_prefix = f"{base.protocol}{base.host}:{base.port}"
    if link[0:2] == "//":
        link = "http:" + link
    elif link[0:1] == "/":
        link = base_prefix + link
    elif link[0:2] == "./":
        link = base_prefix + base.path + link[2:]
    elif _ABS_SCHEME_RE.match(link):
        pass
    elif _OTHER_SCHEME_RE.match(link):
        link = ""
    elif link[0:3] == "../":
        new_path = base.path
        while link[0:3] == "../":
            new_path = _POP_SEGMENT_RE.sub("/", new_path)
            link = link[3:]
        link = base_prefix + new_path + link
    elif link[0:1] == "#":
        link = ""
    elif link[0:1] == "?":
        link = base_prefix + base.path + base.file + link
    else:
        link = base_prefix + base.path + link

    if link == "":
        return None
    link = link.replace("\n", "").replace("\r", "")
    return normalize_url(link)


def url_md5(url: str) -> str:
    """Frontier dedup key: lowercase hex md5 of the canonical URL."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()


def format_url(base_url: str | None, link: str) -> str | None:
    """C4: the reference's SECOND, simpler relative resolver used by the
    extractors (/root/reference/libs/Formatter.class.php:11-60), with its
    quirks preserved verbatim:

    - only ``http://`` / ``ftp://`` prefixes pass through untouched
      (https does NOT — it resolves as a relative path);
    - backslashes become slashes BEFORE any parsing;
    - the base is ``dirname(url) + '/'``; a missing host falls back to
      ``^http://([a-zA-Z0-9.]+)`` on the original url, else None;
    - root-relative links drop the base's PORT (``scheme://host + str``);
    - each ``../`` pops one path segment (popping an empty segment pops
      once more), then ALL ``../`` and ``./`` substrings are stripped.
    """
    if not base_url:
        return link
    s = link
    low = s.lower()
    if low.startswith("http://") or low.startswith("ftp://"):
        return s
    s = s.replace("\\", "/")

    import posixpath
    from urllib.parse import urlparse

    try:
        p = urlparse(posixpath.dirname(base_url) + "/")
    except ValueError:
        p = None
    scheme = (p.scheme if p and p.scheme else "http")
    host = ""
    if p and p.netloc:
        host = p.netloc.rsplit("@", 1)[-1].split(":")[0]
    if not host:
        m = re.match(r"http://([a-zA-Z0-9.]+)", base_url, re.I | re.S)
        if not m:
            return None
        host = m.group(1)
    path = p.path if p else ""

    if s.startswith("/"):
        return f"{scheme}://{host}{s}"
    part = path.split("/")
    part.pop(0)
    for _ in range(s.count("../")):
        if part:
            popped = part.pop()
            if popped == "" and part:
                part.pop()
    path = "/".join(part)
    s = s.replace("../", "").replace("./", "")
    path = "/" if path == "" else "/" + path.strip("/") + "/"
    return f"{scheme}://{host}{path}{s}"
