"""Web-corpus URL operations: extraction, canonicalization, domain keys.

Every web-scraped training corpus (C4, CommonCrawl derivatives) dedups and
filters BY URL before it dedups by content: canonicalize the URL, collapse
exact duplicates, bucket by registered domain for per-site caps. The
reference engine has no string-processing surface at all (its scalar
library is normalization-for-comparison only, SURVEY §2.3); these are pure
`pyspark.sql.functions` Column expressions — whole-stage codegen, no UDF,
no shuffle — matching the rest of functions/text.py.

Canonicalization (canonical_url) applies, in order:
  1. trim; lowercase the scheme and host (ONLY them — paths are
     case-sensitive per RFC 3986);
  2. strip a url fragment (#...);
  3. drop tracking query parameters (utm_*, fbclid, gclid, msclkid,
     mc_eid, igshid, ref_src) and a then-empty '?';
  4. strip default ports (:80 on http, :443 on https);
  5. collapse a bare trailing slash on a path-less URL.
The result is deterministic and idempotent (property-tested) — the right
key for exact URL dedup. It is intentionally NOT full RFC normalization
(no percent-decoding, no path-segment resolution): those alter semantics
on hostile real-world URLs more often than they merge true duplicates.

registered_domain uses the last-two-labels heuristic with an explicit
multi-part-suffix list for the common cases (co.uk, com.au, ...). A full
public-suffix-list lookup is a broadcast join against the PSL snapshot —
documented swap-in, same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"https?://[^\s<>\"')\]]+"

_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)=[^&#\s]*"

# common multi-part public suffixes for the heuristic registered_domain;
# the full PSL is a documented broadcast-join swap-in
_MULTIPART_SUFFIXES = (
    "co.uk ac.uk gov.uk org.uk me.uk com.au net.au org.au com.br com.cn "
    "com.mx com.tr com.ar co.jp co.kr co.in co.nz co.za com.sg com.hk"
).split()


def extract_urls(col) -> Column:
    """array<string> of every http(s) URL occurring in a text column;
    trailing sentence punctuation is stripped per match (a URL at the end
    of a sentence should not carry its period)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract_all(c, F.lit(_URL_RE), 0)
    return F.transform(raw, lambda u: F.regexp_replace(u, r"[.,;:!?]+$", ""))


def url_host(col) -> Column:
    """Lowercased hostname (no port) of a URL column; '' if unparseable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))


def registered_domain(col) -> Column:
    """Heuristic registrable domain of a URL column: last two host labels,
    or last three when the last two are a known multi-part suffix
    (co.uk etc.). Deterministic, codegen-only."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    is_multi = last2.isin(_MULTIPART_SUFFIXES)
    take3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n >= 3, F.when(is_multi, take3).otherwise(last2))
        .when(n == 2, last2)
        .otherwise(host)
    )


def canonical_url(col) -> Column:
    """Deduplication key for a URL column (see module docstring for the
    exact rule order). Idempotent; pure regexp pipeline inside codegen."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.trim(c)
    # 1. lowercase scheme+host only: split at the first path/query/frag char
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substr(u, F.length(head) + 1)
    u = F.concat(F.lower(head), tail)
    # 2. strip fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. drop tracking params (any position), then tidy separators
    u = F.regexp_replace(u, r"(?i)" + _TRACKING, "")
    u = F.regexp_replace(u, r"\?&+", "?")        # '?&x=1' -> '?x=1'
    u = F.regexp_replace(u, r"&&+", "&")         # 'a=1&&b=2' -> 'a=1&b=2'
    u = F.regexp_replace(u, r"[?&]+$", "")       # trailing '?' / '&'
    # re-trim: stripping a fragment/params can EXPOSE trailing whitespace
    # the initial trim ran before ('https://x/ #' -> 'https://x/ ') — found
    # by the idempotence fuzz
    u = F.trim(u)
    # 4. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", r"$1")
    # 5. bare trailing slash on a path-less URL
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def dedup_by_url(df, url_col: str = "url"):
    """One row per canonical URL (first by input order is NOT deterministic
    in a distributed engine; keeps max by the remaining columns' natural
    struct order — pass a pre-sorted tiebreak column for a specific
    policy). Composition demo: canonical_url + exact groupBy dedup."""
    key = canonical_url(url_col).alias("__curl")
    others = [c for c in df.columns if c != url_col]
    return (
        df.select(key, url_col, *others)
        .groupBy("__curl")
        .agg(F.max(F.struct(url_col, *others)).alias("__r"))
        .select("__curl", "__r.*")
        .withColumnRenamed("__curl", "canonical_url")
    )


def html_to_text(col) -> Column:
    """Visible text from an HTML document — the extraction step between
    WARC ingestion (sources/warc.py) and every text operator in this
    repo (C4 runs exactly this shape of pipeline). Pure regexp Columns
    inside codegen: script/style/comment blocks go first (their contents
    are not text), then tags, then the common entities, then whitespace
    normalization. A DOM parser it is not — boilerplate removal beyond
    this (nav/footer heuristics) belongs to a trafilatura-class library;
    this is the deterministic, dependency-free 95% case."""
    c = F.regexp_replace(col, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
