"""URL canonicalization for web-corpus pipelines.

A crawl dedups first by URL KEY before any content pass: the same
page arrives as `HTTP://WWW.Site.com/a/?utm_source=x`,
`http://site.com/a` and `https://site.com:443/a#top`.
``url_normalize`` collapses that class to one key; ``url_domain``
yields the grouping key for per-domain quotas and leakage-safe
train/validation splits (pass it to ``pipeline.sampling.assign_split``
so one site can never straddle splits).

All pure Column expressions over ``try_parse_url`` (JVM-side,
codegen'd; invalid URLs → NULL, never an error) — at 100 TB these run
inside the corpus scan projection, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that identify a click, not a resource — dropped
# from the canonical key. Deliberately the UNAMBIGUOUS set only:
# bare `ref` is excluded because many hosts use it to SELECT the
# resource (?ref=<branch> on code forges, ?ref=<page> in docs), and
# stripping it would collapse genuinely distinct pages into one dedup
# key, silently dropping real content. Callers who know their corpus
# can pass an extended list via ``url_normalize(..., tracking_params=...)``.
TRACKING_PARAMS = ("utm_[a-z]+", "gclid", "fbclid", "msclkid", "mc_[a-z]+")

# second-level labels under which the registrable domain needs THREE
# labels (shop.co.nz, not co.nz). An approximation of the public
# suffix list restricted to the generic second-levels; a deployment
# with a full PSL swaps this tuple for it.
_SECOND_LEVELS = ("co", "com", "net", "org", "ac", "govt", "gov", "edu", "mil", "geek", "school", "iwi")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(url: Column | str) -> Column:
    """Lower-cased host with any leading ``www.`` stripped; NULL for
    unparseable URLs."""
    host = F.lower(F.try_parse_url(_col(url), F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain(url: Column | str) -> Column:
    """Registrable-domain approximation: the last two host labels, or
    three when the second-to-last is a generic second-level
    (``shop.co.nz`` → ``shop.co.nz``; ``sub.example.com`` →
    ``example.com``). The grouping key for per-domain quotas and
    leakage-safe splits."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, F.greatest(n - F.lit(1), F.lit(1)))
    take = F.when(
        (n >= 3) & second.rlike("^(" + "|".join(_SECOND_LEVELS) + ")$"), F.lit(3)
    ).otherwise(F.lit(2))
    return F.when(
        n > take, F.array_join(F.slice(labels, n - take + 1, take), ".")
    ).otherwise(host)


def url_normalize(
    url: Column | str, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Canonical dedup key for a URL:

    - scheme and host lower-cased, leading ``www.`` stripped
    - fragment dropped; default ports (80/http, 443/https) dropped,
      other ports kept
    - tracking parameters removed (``tracking_params`` regex names,
      default :data:`TRACKING_PARAMS` — the unambiguous utm_/gclid/
      fbclid/msclkid/mc_ set; resource-selecting params like bare
      ``ref`` are NOT stripped by default), remaining query
      parameters SORTED (param order is transport noise)
    - trailing slashes trimmed from the path; empty path → ``/``

    NULL for unparseable URLs (``try_parse_url`` semantics), so a
    dedup keyed on the result quarantines garbage rows as one NULL
    group instead of failing the job.
    """
    u = _col(url)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = url_host(u)
    auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.split(F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit("")), "&")
    if tracking_params:
        tracking = "^(" + "|".join(tracking_params) + ")="
        keep = lambda p: (p != "") & ~p.rlike(tracking)  # noqa: E731
    else:
        # an empty tuple must strip NOTHING — building '^()=' from it
        # would match any '=value' param and silently drop it
        keep = lambda p: p != ""  # noqa: E731
    kept = F.array_sort(F.filter(params, keep))
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part),
    )
