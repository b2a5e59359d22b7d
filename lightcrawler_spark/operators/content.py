"""Content extraction (SURVEY.md §2.4 E7–E16, §2.3 C6–C8, E19).

Reimplements, Spark-first, what the reference's extractor computes
(/root/reference/worker/ExtractContent.class.php):

- JVM expression layer (whole-stage codegen, ALSO ANSI-SQL expressible
  so the DuckDB oracle verifies values): date normalization (C7,
  `UnifyPublishtime` :206-221), doc_ori_no normalization (C8,
  `UnifyDocOriNo` :227-241 + pattern :154-156), title guess (E13,
  `guessTitle` :548-576), t_valid rule (E14, `getTvalidTime` :607-616),
  book-title named entities (E16, :158-160), index-block lines (E11,
  `indexBlock` :525-542), attachment/image harvest (E15, :741-788 +
  pattern :202-204), attachment type coding (E19,
  worker/SpiderFrame.class.php:337-370).
- Arrow-kernel layer (pandas UDF over batches — the reference walks a
  DOM per page, which has no relational equivalent): HTML→text walk
  (E7 `_toText` :264-346: block tags→newline, td/th cell bars, <p>
  collection, h1-h4/strong title candidates, [tag:img:url] markers),
  special-tag removal (E8 :874-918), main-content selection (E10
  `getContent`/`lineBlockDensityExtracting` :622-706: paragraph-ratio
  else line-block density), summary-field label extraction (E12
  `parseSummary` :397-517), charset sniff + GBK decode (C6,
  libs/CharsetHelper.class.php:19-35).

All regex/walk logic here is written from the cited *semantics*; no
code is translated from the reference (PHP/DOMDocument anyway).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "cn_date_parts", "unify_publish_time", "unify_doc_ori_no",
    "title_guess", "t_valid_date", "negs_list", "index_block_filter",
    "harvest_attachments", "attachment_type_code",
    "prune_link_blocks", "html_text_struct", "html_to_text_udf",
    "main_content", "decode_charset_udf", "extract_summary_udf",
]

# ---------------------------------------------------------------------------
# JVM expression layer
# ---------------------------------------------------------------------------

# ExtractContent.class.php:214 — ([0-9]{4})[年-]([0-9]{1,2})[月-]([0-9]{1,2})日?
_CN_DATE_RE = r"([0-9]{4})[年\-]([0-9]{1,2})[月\-]([0-9]{1,2})日?"


def cn_date_parts(col: Column) -> tuple[Column, Column, Column]:
    y = F.regexp_extract(col, _CN_DATE_RE, 1).try_cast("int")
    m = F.regexp_extract(col, _CN_DATE_RE, 2).try_cast("int")
    d = F.regexp_extract(col, _CN_DATE_RE, 3).try_cast("int")
    return y, m, d


def unify_publish_time(col: Column) -> Column:
    """C7: `YYYY[年-]M[月-]D[日]` → DATE (reference converts to unix ts
    via strtotime; DATE keeps the oracle timezone-free). Non-matching
    strings → NULL (reference passes them through raw; callers gate)."""
    y, m, d = cn_date_parts(col)
    return F.when(
        y.isNotNull() & m.isNotNull() & d.isNotNull(),
        F.try_to_date(F.format_string("%d-%02d-%02d", y, m, d)),
    )


# ExtractContent.class.php:154-156 — （?(org 2-20 CJK)〔[（(year)〕])）第?(no)号）?
_DOC_NO_RE = (
    r"（?([一-龥]{2,20}?)[（\[〔【\(]([0-9]+)[）\]〕】\)]第?([0-9]+)号）?"
)


def unify_doc_ori_no(col: Column) -> Column:
    """C8: canonical `org(year)no号`; unmatched values pass through
    unchanged (ExtractContent.class.php:227-241)."""
    org = F.regexp_extract(col, _DOC_NO_RE, 1)
    year = F.regexp_extract(col, _DOC_NO_RE, 2)
    no = F.regexp_extract(col, _DOC_NO_RE, 3)
    return F.when(
        org != "", F.concat(org, F.lit("("), year, F.lit(")"), no, F.lit("号"))
    ).otherwise(col)


def title_guess(title_col: Column) -> Column:
    """E13: <title> text split on `_`/`-` (multiexplode: all delimiters
    collapse to the first), first segment, trimmed
    (ExtractContent.class.php:548-576)."""
    return F.trim(
        F.element_at(F.split(F.replace(title_col, F.lit("-"), F.lit("_")), "_"), 1)
    )


# ExtractContent.class.php:607-616 — 自YYYY年M月D日起施行
_T_VALID_RE = r"自([0-9]{4})年([0-9]+)月([0-9]+)日起施行"


def t_valid_date(col: Column) -> Column:
    """E14: effective-date rule → DATE."""
    y = F.regexp_extract(col, _T_VALID_RE, 1).try_cast("int")
    m = F.regexp_extract(col, _T_VALID_RE, 2).try_cast("int")
    d = F.regexp_extract(col, _T_VALID_RE, 3).try_cast("int")
    return F.when(
        y.isNotNull() & m.isNotNull() & d.isNotNull(),
        F.try_to_date(F.format_string("%d-%02d-%02d", y, m, d)),
    )


def negs_list(col: Column) -> Column:
    """E16: 《…》 book-title quotes, de-duplicated, order of first
    occurrence (ExtractContent.class.php:158-160, 823-832)."""
    return F.array_distinct(F.regexp_extract_all(col, F.lit("《(.*?)》"), 1))


# ExtractContent.class.php:534 — ^([\[CJK\s]{2,8})[：】:|\]].*
_INDEX_LINE_RE = r"^([\[一-龥 ]{2,8})[：】:|\]].*"


def index_block_filter(lines_df: DataFrame, line_col: str = "line") -> DataFrame:
    """E11: keep metadata key/value lines — 2-8 leading CJK chars followed
    by a label delimiter. The reference first strips whitespace/【
    (ExtractContent.class.php:532)."""
    cleaned = F.regexp_replace(
        F.trim(F.col(line_col)), r"[\s　【]+", ""
    )
    return (
        lines_df.withColumn(line_col, cleaned)
        .filter(F.length(F.col(line_col)) > 0)
        .filter(F.col(line_col).rlike(_INDEX_LINE_RE))
    )


# ExtractContent.class.php:202-204 (doc extensions) + :775-780 (img src)
_ATTACH_HREF_RE = (
    r'href\s*=\s*"([^"]+\.(?:doc|docx|pdf|txt|xls|ceb))"'
)
_ATTACH_IMG_RE = r'src\s*=\s*"([^"]*/userfiles/image/[0-9]+\.(?:png|jpg))"'


def harvest_attachments(pages_df: DataFrame, body_col: str = "body_text",
                        url_col: str = "url") -> DataFrame:
    """E15: document links + CMS image urls → (referer, att_url, kind)
    rows, order preserved per page; feeds frontier rows with
    route='attachment'/'image'."""
    docs = pages_df.select(
        F.col(url_col).alias("referer"),
        F.explode_outer(
            F.regexp_extract_all(F.col(body_col), F.lit(_ATTACH_HREF_RE), 1)
        ).alias("att_url"),
        F.lit("attachment").alias("kind"),
    ).filter(F.col("att_url").isNotNull())
    imgs = pages_df.select(
        F.col(url_col).alias("referer"),
        F.explode_outer(
            F.regexp_extract_all(F.col(body_col), F.lit(_ATTACH_IMG_RE), 1)
        ).alias("att_url"),
        F.lit("image").alias("kind"),
    ).filter(F.col("att_url").isNotNull())
    return docs.unionByName(imgs)


def attachment_type_code(url_col: Column) -> Column:
    """E19: extension → type enum (worker/SpiderFrame.class.php:337-370;
    enums worker/DaoSpiderlLawBase.class.php:14-22): html=1 json=2 txt=3
    doc=4 docx=5 xls=6 xlsx=7 pdf=8 fragment=9, default html."""
    ext = F.lower(F.regexp_extract(url_col, r"\.([A-Za-z0-9]+)(?:\?.*)?$", 1))
    return (
        F.when(ext.isin("html", "htm", "shtml"), 1)
        .when(ext == "json", 2)
        .when(ext == "txt", 3)
        .when(ext == "doc", 4)
        .when(ext == "docx", 5)
        .when(ext == "xls", 6)
        .when(ext == "xlsx", 7)
        .when(ext == "pdf", 8)
        .otherwise(1)
        .cast("int")
    )


# ---------------------------------------------------------------------------
# Arrow-kernel layer
# ---------------------------------------------------------------------------

# --- E9: link-block pruning (nav-menu removal) ----------------------------

_VOID_TAGS = {
    "br", "img", "hr", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


class _BlockTracker(HTMLParser):
    """Builds a lightweight element tree with source-offset spans and the
    per-element anchor metrics E9 needs (ExtractContent.class.php:946-983):
    block text length (whitespace-stripped descendant text), descendant
    <a> count, and summed non-empty anchor text length."""

    def __init__(self, html: str):
        super().__init__(convert_charrefs=True)
        self.html = html
        self._line_off = [0]
        for line in html.split("\n"):
            self._line_off.append(self._line_off[-1] + len(line) + 1)
        self.roots: list[dict] = []
        self.body: dict | None = None
        self._stack: list[dict] = []
        self._anchors: list[tuple[list[dict], list[str]]] = []

    def _offset(self) -> int:
        line, col = self.getpos()
        return self._line_off[line - 1] + col

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        node = {
            "tag": tag, "start": self._offset(), "end": None,
            "children": [], "text_len": 0, "a_text_len": 0, "a_count": 0,
        }
        if self._stack:
            self._stack[-1]["children"].append(node)
        else:
            self.roots.append(node)
        if tag == "body" and self.body is None:
            self.body = node
        if tag == "a":
            # getElementsByTagName('a') counts EVERY descendant anchor,
            # even empty-text ones (:958-960)
            ancestors = list(self._stack)
            for n in ancestors:
                n["a_count"] += 1
            self._anchors.append((ancestors, []))
        self._stack.append(node)

    def _close_node(self, node):
        end = self.html.find(">", self._offset())
        node["end"] = end + 1 if end >= 0 else len(self.html)
        if node["tag"] == "a" and self._anchors:
            ancestors, buf = self._anchors.pop()
            a_text = re.sub(r"\s+", "", "".join(buf))
            if a_text:
                for n in ancestors:
                    n["a_text_len"] += len(a_text)

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if not any(n["tag"] == tag for n in self._stack):
            return
        while self._stack:
            node = self._stack.pop()
            self._close_node(node)
            if node["tag"] == tag:
                break

    def handle_data(self, data):
        stripped = re.sub(r"\s+", "", data)
        if stripped:
            for n in self._stack:
                n["text_len"] += len(stripped)
        if self._anchors and any(n["tag"] == "a" for n in self._stack):
            self._anchors[-1][1].append(data)

    def finish(self):
        while self._stack:
            node = self._stack.pop()
            node["end"] = len(self.html)
            if node["tag"] == "a" and self._anchors:
                ancestors, buf = self._anchors.pop()
                a_text = re.sub(r"\s+", "", "".join(buf))
                if a_text:
                    for n in ancestors:
                        n["a_text_len"] += len(a_text)


def prune_link_blocks(html: str) -> str:
    """E9 (`linkBlocks` + `deleteNodes`,
    /root/reference/worker/ExtractContent.class.php:926-983; applied to
    the <body> by e.g. worker/SpiderZhengceBeijingGov.class.php:48):
    remove div/ul/ol blocks whose anchor-text/total-text ratio exceeds
    0.6 with mean anchor length strictly between 1 and 6 (integer-
    truncated over ALL descendant anchors) — nav menus. The walk descends
    only through div/ul/ol chains from the body and evaluates outer
    blocks first on the INTACT tree, exactly like the reference's
    recursion; matched subtrees are spliced out of the source."""
    if not html:
        return html
    t = _BlockTracker(html)
    try:
        t.feed(html)
        t.close()
    except Exception:
        return html
    t.finish()

    spans: list[tuple[int, int]] = []

    def walk(node_children):
        for child in node_children:
            if child["tag"] in ("div", "ul", "ol"):
                btl = child["text_len"]
                atl = child["a_text_len"]
                cnt = child["a_count"]
                avg = int(atl / cnt) if cnt else 0
                if btl > 0 and atl / btl > 0.6 and avg != 0 and 1 < avg < 6:
                    spans.append((child["start"], child["end"]))
                else:
                    walk(child["children"])
            # non-div/ul/ol children are NOT descended into — the
            # reference's recursion only chains through these tags

    walk((t.body or {"children": t.roots})["children"])
    if not spans:
        return html
    out, pos = [], 0
    for s, e in sorted(spans):
        if s >= pos:
            out.append(html[pos:s])
            pos = max(pos, e)
    out.append(html[pos:])
    return "".join(out)


_BLOCK_TAGS = {"br", "div", "p", "tr", "ul", "ol", "li"}
_TITLE_TAGS = {"strong", "h1", "h2", "h3", "h4"}
_DROP_TAGS = {"script", "style", "link"}


class _ToText(HTMLParser):
    """E7/E8: linear HTML walk with the reference's emission rules
    (ExtractContent.class.php:264-346): block tags emit newline, td/th
    content is followed by a `|` cell bar, <p> text collected separately
    (textP), h1-h4/strong collected as title candidates, <img src>
    emits a `[tag:img:src]` marker when keep_img."""

    def __init__(self, keep_img: bool = False):
        super().__init__(convert_charrefs=True)
        self.keep_img = keep_img
        self.out: list[str] = []
        self.text_p: list[str] = []
        self.titles: dict[str, str] = {}
        self.images: list[str] = []
        self.page_title = ""
        self._stack: list[str] = []
        self._p_buf: list[str] = []
        self._title_buf: list[str] = []
        self._cap_tag: str | None = None
        self._drop_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self.out.append("\n")
        if tag == "p":
            self._p_buf = []
        if tag in _TITLE_TAGS and self._cap_tag is None:
            self._cap_tag = tag
            self._title_buf = []
        if tag == "img" and self.keep_img:
            src = dict(attrs).get("src")
            if src:
                marker = f"[tag:img:{src}]"
                self.out.append(marker + "\n")
                self.images.append(src)
                if "p" in self._stack:
                    self.text_p.append(marker + "\n")
        self._stack.append(tag)

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = False
        while self._stack and self._stack[-1] != tag:
            self._stack.pop()
        if self._stack:
            self._stack.pop()
        if tag == "p":
            self.text_p.append("".join(self._p_buf))
            self._p_buf = []
        if tag in ("td", "th"):
            self.out.append("|")
        if tag == self._cap_tag:
            self.titles[tag] = "".join(self._title_buf).strip()
            self._cap_tag = None

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._in_title:
            self.page_title += data
            return
        t = data.strip()
        self.out.append(t)
        if "p" in self._stack:
            self._p_buf.append(data)
        if self._cap_tag is not None:
            self._title_buf.append(data)


def html_text_struct(html: str, keep_img: bool = False,
                     prune_nav: bool = True) -> dict:
    if prune_nav:
        html = prune_link_blocks(html or "")
    p = _ToText(keep_img=keep_img)
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    text = "".join(p.out)
    return {
        "text": text,
        "text_p": p.text_p,
        "page_title": p.page_title.strip(),
        "title_candidates": [p.titles[t] for t in
                             ("h1", "h2", "h3", "h4", "strong") if t in p.titles],
        "images": p.images,
        "content": main_content(text, p.text_p),
    }


def main_content(text: str, text_p: list[str],
                 blocksize: int = 3, ignore_ratio: bool = False) -> str:
    """E10 (`getContent` :622-645 + `lineBlockDensityExtracting`
    :647-706): if stripped-<p>-chars / stripped-total-chars >= 0.01 the
    paragraphs win; else keep the longest contiguous run of lines whose
    sliding 3-line block length stays > 0."""
    if not text:
        return ""
    p_len = len(re.sub(r"\s+", "", "".join(text_p)))
    t_len = len(re.sub(r"\s+", "", text))
    if t_len == 0:
        return ""
    if not ignore_ratio and p_len / t_len >= 0.01:
        return "\n".join(text_p)

    lines = [re.sub(r"\s+", "", ln.strip()) for ln in text.split("\n")]
    n = len(lines)
    lens = np.array([len(x) for x in lines], dtype=np.int64)
    w = min(n, blocksize)
    if n == 0:
        return ""
    # sliding-window block lengths (cumsum — the reference's rolling update)
    cs = np.concatenate([[0], np.cumsum(lens)])
    block = cs[w:] - cs[:-w] if n >= w else np.array([lens.sum()])

    best, cur, cur_len, best_len = "", [], 0, 0
    for i in range(len(block)):
        if block[i] > 0:
            if lines[i]:
                cur.append(lines[i])
                cur_len += len(lines[i])
        elif block[i] == 0:
            cur, cur_len = [], 0
        if cur_len > best_len:
            best_len = cur_len
            best = "\n".join(cur) + "\n" if cur else ""
    return best


_TEXT_STRUCT = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("text_p", T.ArrayType(T.StringType())),
    T.StructField("page_title", T.StringType()),
    T.StructField("title_candidates", T.ArrayType(T.StringType())),
    T.StructField("images", T.ArrayType(T.StringType())),
    T.StructField("content", T.StringType()),
])


@pandas_udf(_TEXT_STRUCT)
def html_to_text_udf(bodies: pd.Series) -> pd.DataFrame:
    rows = [html_text_struct(b if isinstance(b, str) else "", keep_img=True)
            for b in bodies]
    return pd.DataFrame(rows)


# --- C6: charset sniff + decode -------------------------------------------

# libs/CharsetHelper.class.php:19-27 — <meta … charset=…>
_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I
)


def sniff_charset(body: bytes, header_charset: str | None = None) -> str:
    if header_charset:
        return header_charset.lower()
    m = _CHARSET_RE.search(body or b"")
    if m:
        return m.group(1).decode("ascii", "ignore").lower()
    return "utf-8"


@pandas_udf(T.StringType())
def decode_charset_udf(bodies: pd.Series, header_charsets: pd.Series) -> pd.Series:
    """C6: decode page bytes per sniffed charset; GBK/GB2312 → UTF-8 like
    the reference's mb_convert_encoding (CharsetHelper.class.php:28-34)."""
    out = []
    for body, hc in zip(bodies, header_charsets):
        if body is None:
            out.append(None)
            continue
        b = bytes(body)
        cs = sniff_charset(b, hc if isinstance(hc, str) and hc else None)
        if cs in ("gbk", "gb2312", "gb18030"):
            cs = "gb18030"  # superset decode, like mb_convert_encoding GBK
        try:
            out.append(b.decode(cs, errors="replace"))
        except LookupError:
            out.append(b.decode("utf-8", errors="replace"))
    return pd.Series(out)


# --- E12: summary-field extraction ----------------------------------------

# ExtractContent.class.php:162-174 (label table; first match per field wins)
SUMMARY_WORDS: dict[str, list[str]] = {
    "author": ["发布机构", "发文机关", "发布单位", "发文机构", "办文部门",
               "颁布单位", "信息来源"],
    "title": ["公文名称", "信息名称", "标题", "名称"],
    "tags": ["效力级别", "所属类别", "主题分类", "信息类别", "分类"],
    "index_ori_no": ["索引号", "信息索引", "索取号"],
    "doc_ori_no": ["文号", "发文字号", "文件编号", "发布文号"],
    "publish_time": ["发文日期", "发布日期", "发布时间", "颁布日期",
                     "生产日期", "时间"],
    "keywords": ["主题词"],
    "t_valid": ["执行日期", "生效日期", "实施日期", "有效时间", "有效期"],
    "t_invalid": ["失效日期", "时效性", "废止日期"],
}
_DELIMS = {":", "：", "】", "|", "]"}


def extract_summary(index_blocks: list[str]) -> dict[str, str]:
    """E12 (`parseSummary` :397-456): locate each field's first matching
    label (label + delimiter), then slice each value from after its label
    to the next label position (labels sorted by position) or
    end-of-line; strip `|` bars."""
    s = "\n".join(index_blocks)
    found: dict[str, tuple[int, int]] = {}
    positions: list[int] = []
    for field, needles in SUMMARY_WORDS.items():
        for needle in needles:
            if field in found:
                break
            p = s.find(needle)
            if p < 0:
                continue
            ln = len(needle)
            if p > 0 and s[p - 1] == "[":
                p -= 1
                ln += 1
            if p + ln < len(s) and s[p + ln] in _DELIMS:
                positions.append(p)
                found[field] = (p, ln + 1)
    positions.sort()
    out: dict[str, str] = {}
    for field, (p, ln) in found.items():
        i = positions.index(p)
        if i < len(positions) - 1:
            val = s[p + ln: positions[i + 1]]
        else:
            nl = s.find("\n", p + ln)
            val = s[p + ln:] if nl < 0 else s[p + ln: nl]
        out[field] = val.strip().replace("|", "").strip()
    return out


_SUMMARY_STRUCT = T.StructType(
    [T.StructField(f, T.StringType()) for f in SUMMARY_WORDS]
)


@pandas_udf(_SUMMARY_STRUCT)
def extract_summary_udf(texts: pd.Series) -> pd.DataFrame:
    rows = []
    for t in texts:
        lines = (t or "").split("\n")
        # E11 pre-filter (indexBlock :525-542)
        blocks = []
        for ln in lines:
            ln2 = re.sub(r"[\s　【]+", "", ln.strip())
            if ln2 and re.match(_INDEX_LINE_RE, ln2):
                blocks.append(ln2)
        got = extract_summary(blocks)
        rows.append({f: got.get(f) for f in SUMMARY_WORDS})
    return pd.DataFrame(rows)
