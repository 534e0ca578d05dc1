"""HTML chain (SURVEY §2.2 F4-F7) + display formatting (X11) —
previously declared non-goals for the mandated source-code corpus, now
implemented as pure column plans so the inventory closes at 72/72.

Reference semantics re-expressed Spark-first (no DOM library — the
reference's own parse is a three-tag SoupStrainer, i.e. regular-shaped
extraction, which regexp_extract_all expresses exactly):

  F4  link/img extraction + relative-URL resolution + non-ASCII skip
      (crawler/get_urls_from_html.go:13-130)
  F5  selective parse: only <title>/<meta>/<p> are ever inspected
      (indexer/utils/utils.py:98)
  F6  meta projection: og:* first, plain tag fallback, coalesce
      (indexer/utils/utils.py:100-109)
  F7  paragraph text join + bracket strip (indexer/utils/utils.py:112-115)
  X11 ucwords + thousands-separator display formatting
      (search-results.blade.php:52, client/src/script.js:77-101)

Everything is JVM-side (regexp_extract_all / transform / filter /
concat) — no UDFs, fully pushdown-friendly, and mirrored 1:1 by DuckDB
SQL oracles in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HREF_RE = r'<a\s[^>]*href="([^"]*)"'
_IMG_RE = r'<img\s[^>]*src="([^"]*)"[^>]*alt="([^"]*)"'
_P_RE = r"<p[^>]*>(.*?)</p>"
_TITLE_RE = r"<title>(.*?)</title>"


def _meta_re(prop: str) -> str:
    return f'<meta\\s[^>]*(?:property|name)="{prop}"[^>]*content="([^"]*)"'


def resolve_url(base: Column, href: Column) -> Column:
    """The reference's relative-link resolution
    (get_urls_from_html.go:61-104 via net/url.ResolveReference), over a
    base of form scheme://host/dir/page: absolute http(s) hrefs pass
    through, '/rooted' joins scheme://host, anything else joins the base
    directory; then RFC-3986 dot segments collapse ('/./' removal and up
    to 4 levels of '/seg/../').  The collapse uses only lookaround-free
    regexes so the DuckDB (RE2) oracle applies the identical passes.
    Fragments/queries are the caller's concern (F2)."""
    scheme_host = F.regexp_extract(base, r"^(https?://[^/]+)", 1)
    # a path-less base ('https://host.example') must resolve relatives
    # against 'https://host.example/' — the last-segment strip would
    # otherwise eat the hostname itself (the '/' it finds is in '//')
    base_dir = F.when(
        base.rlike("^https?://[^/]+$"), F.concat(base, F.lit("/"))
    ).otherwise(F.regexp_replace(base, r"[^/]*$", ""))
    joined = (
        F.when(href.rlike("^https?://"), href)
        .when(href.startswith("/"), F.concat(scheme_host, href))
        .otherwise(F.concat(base_dir, href))
    )
    # one-pass run collapse: '(?:/\.)+/' eats ADJACENT dot segments
    # ('a/././b' -> 'a/b') which a plain '/\./' global replace leaves
    # half-collapsed (the regex engine resumes after each replacement)
    out = F.regexp_replace(joined, r"(?:/\.)+/", "/")
    for _ in range(4):  # nested ../.. resolves one level per pass
        out = F.regexp_replace(out, r"/[^/]+/\.\./", "/")
    return out


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """F4 — one row per extracted <a href>, resolved against the page
    URL, skipping malformed/non-ASCII targets (the reference drops any
    URL that fails its ASCII check, get_urls_from_html.go:39-44).
    Returns (url, link) distinct, ordered."""
    links = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), F.lit(1))
    ).alias("href")
    out = (
        pages.select(F.col(url_col).alias("url"), links)
        .filter((F.col("href") != "") & F.col("href").rlike("^[\\x20-\\x7e]+$"))
        .select("url", resolve_url(F.col("url"), F.col("href")).alias("link"))
        .distinct()
    )
    return out.orderBy("url", "link")


def extract_images(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """F4 (img half) — one row per <img src alt>, src resolved like
    links: (url, img_src, img_alt)."""
    pairs = F.explode(
        F.arrays_zip(
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_RE), F.lit(1)).alias("src"),
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_RE), F.lit(2)).alias("alt"),
        )
    ).alias("im")
    return (
        pages.select(F.col(url_col).alias("url"), pairs)
        .filter(F.col("im.src") != "")
        .select(
            "url",
            resolve_url(F.col("url"), F.col("im.src")).alias("img_src"),
            F.col("im.alt").alias("img_alt"),
        )
        .orderBy("url", "img_src")
    )


def meta_projection(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """F6 — (url, title, description, canonical_url): og:tag first,
    plain tag fallback, NULL when neither exists (utils.py:100-109
    first-non-null chain, expressed as coalesce of regexp extracts —
    F5's selectivity is structural: ONLY title/meta patterns are ever
    evaluated, nothing else in the page is touched)."""
    h = F.col(html_col)

    def ext(pattern: str) -> Column:
        m = F.regexp_extract(h, pattern, 1)
        return F.when(m != "", m)

    return pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(ext(_meta_re("og:title")), ext(_TITLE_RE)).alias("title"),
        F.coalesce(
            ext(_meta_re("og:description")), ext(_meta_re("description"))
        ).alias("description"),
        F.coalesce(ext(_meta_re("og:url")), F.col(url_col)).alias("canonical_url"),
    ).orderBy("url")


def paragraph_text(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """F7 — join all <p> bodies with a space, then strip [bracketed]
    runs (utils.py:112-115: ' '.join(p texts) then re.sub('\\[.*?\\]'))."""
    ps = F.regexp_extract_all(F.col(html_col), F.lit(_P_RE), F.lit(1))
    joined = F.array_join(ps, " ")
    return pages.select(
        F.col(url_col).alias("url"),
        F.regexp_replace(joined, r"\[.*?\]", "").alias("paragraphs"),
    ).orderBy("url")


def display_format(
    results: DataFrame, title_col: str = "title", hits_col: str = "total_hits"
) -> DataFrame:
    """X11 — presentation formatting: PHP ucwords on the title (first
    letter of each space-separated word uppercased, REST UNTOUCHED —
    unlike initcap, which lowercases the rest) and the client's
    Intl.NumberFormat thousands separators on the hit count."""
    words = F.split(F.col(title_col), " ")
    uc = F.array_join(
        F.transform(
            words,
            lambda w: F.concat(
                F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 2147483647)
            ),
        ),
        " ",
    )
    return results.select(
        uc.alias("display_title"),
        F.format_number(F.col(hits_col).cast("long"), 0).alias("display_hits"),
    )
