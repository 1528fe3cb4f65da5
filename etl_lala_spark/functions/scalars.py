"""Named scalar functions for the DATASUS/ETL domain (reference §2.8).

Each cites the hand-rolled TypeScript it replaces; all are JVM built-ins
(codegen'd — no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZIP_URL_RE = r'https?://[^"\s\]]+\.zip'


def competencia(date_col: Column) -> Column:
    """YYYYMM competência string (reference month formatting with
    padStart(2,'0'), src/datasus/datasus.service.ts:75,87)."""
    return F.date_format(date_col, "yyyyMM")


def mes_ano(date_col: Column) -> tuple[Column, Column]:
    """(mes '01'..'12', ano) pair — the reference's {mes, ano} DTO fields."""
    return F.lpad(F.month(date_col).cast("string"), 2, "0"), F.year(date_col)


def basename(path: Column) -> Column:
    """Final path segment (reference path.basename, src/datasus/datasus.service.ts:403)."""
    return F.regexp_extract(path, r"[^/]+$", 0)


def strip_extension(name: Column) -> Column:
    """Drop the trailing extension (reference regex replace, :323-324)."""
    return F.regexp_replace(name, r"\.[^/.]+$", "")


def extract_zip_url(resp: Column) -> Column:
    """First ZIP URL in a response body (reference regex fallback, :204-205)."""
    return F.regexp_extract(resp, ZIP_URL_RE, 0)


def bytes_to_mb(n: Column, digits: int = 2) -> Column:
    """Bytes → MB with fixed decimals (reference toFixed(2) MB logging, :267)."""
    return F.round(n / F.lit(1048576), digits)


def pseudonymize(col: Column, pepper: str) -> Column:
    """Deterministic keyed pseudonymization of a PII column: sha2-256 over a
    peppered value. Same input → same token, so equality joins, groupBys,
    and distinct-counts over the pseudonymized column still work (the
    GDPR-pipeline property that plain redaction destroys); without the
    pepper the token is not reversible by rainbow lookup. Pure codegen —
    pseudonymizing 100 TB costs one scan."""
    return F.sha2(F.concat(F.lit(pepper + "::"), col.cast("string")), 256)


# --- URL canonicalization (FineWeb web-pipeline stage 1) ---------------------

# Tracking parameters stripped before URL-level dedup — the public lists
# (utm_* from Google Analytics, click ids from ad platforms, mailchimp ids)
# every crawl pipeline removes. Anchored at the key: 'ref=' is tracking,
# 'pref=' is not.
TRACKING_PARAM_RE = (
    r"(?i)^(utm_[^=]*|gclid|fbclid|msclkid|twclid|dclid|igshid|mc_cid|mc_eid"
    r"|ref|ref_src|_ga)(=.*)?$"
)  # (?i): campaign links arrive with UTM_SOURCE=/FBCLID= casings too


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for URL-level dedup (the FineWeb/CCNet
    stage-1 key): lowercase scheme and host, strip userinfo, default ports
    (:80 http / :443 https), a leading ``www.``, the fragment, and tracking
    query parameters; sort the surviving query keys (param ORDER is not
    identity); collapse duplicate slashes and a trailing slash in the path
    (``/a/`` == ``/a``; bare host normalizes to path ``/``). Invalid URLs
    → NULL (``try_parse_url``), so a malformed crawl row can't alias a
    real page's key. Pure codegen — canonicalizing 100 TB of crawl URLs
    costs one scan, no UDF."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    host = F.regexp_replace(auth, r"^[^@]*@", "")  # strip userinfo
    host = F.when(proto == "http", F.regexp_replace(host, r":80$", "")).when(
        proto == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(F.regexp_replace(path, r"/{2,}", "/"), r"/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(params, "&")
    return F.when(
        proto.isNull() | host.isNull() | (host == ""), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            proto,
            F.lit("://"),
            host,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


#: Two-label public suffixes under which a THIRD label is the registrable
#: name (shop.example.co.uk → example.co.uk). A pragmatic subset of the
#: Mozilla Public Suffix List's most common ccTLD second-level suffixes —
#: at production scale swap in the full PSL as a broadcast table; the
#: extraction logic below is unchanged.
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.mx", "com.ar", "com.tr", "com.cn", "com.tw", "com.hk", "com.sg",
    "co.in", "co.kr", "co.za", "co.nz", "co.il", "co.id", "co.th",
)


def registered_domain(host: Column) -> Column:
    """The registrable (eTLD+1) domain of a hostname — the grain domain
    blocklists (UT1, C4's spam lists) and per-site quality priors key on:
    ``ads.tracker.com`` → ``tracker.com``, ``shop.example.co.uk`` →
    ``example.co.uk``. Lowercases, strips a port, then takes the last two
    labels — or three when the last two are a known two-label public
    suffix (:data:`TWO_LABEL_SUFFIXES`). A host of ≤2 labels (or one that
    IS a suffix) is returned whole; NULL host stays NULL. Pure codegen —
    one scan keys 100 TB of URLs."""
    h = F.regexp_replace(F.lower(host), r":\d+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(h.isNull(), F.lit(None).cast("string"))
        .when(n <= 2, h)
        .when(last2.isin(*TWO_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def surt_key(url: Column) -> Column:
    """The SURT (Sort-friendly URI Reordering Transform) form of a URL —
    the key the Common Crawl CDX index sorts on (``com,example)/path?q=1``;
    Heritrix/webarchive-commons convention): canonicalize first
    (:func:`canonicalize_url` — lowercase, strip www/ports/tracking
    params, sort query keys), then reverse the host labels comma-joined
    and append ``)`` plus path-and-query. Joining your own URL corpus
    against a CDX index (``operators/web.py:parse_cdxj`` emits this key)
    is one equality join on this column. Invalid URLs → NULL, same as
    canonicalization. Pure codegen."""
    canon = canonicalize_url(url)
    host = F.regexp_extract(canon, r"^https?://([^/?#]+)", 1)
    rest = F.regexp_extract(canon, r"^https?://[^/?#]+(.*)$", 1)
    return F.when(
        canon.isNotNull(),
        F.concat(
            F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), rest
        ),
    )
