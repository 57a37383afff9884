"""URL / domain curation — the crawl-side companion of the text
quality kit.

Every production crawl pipeline curates at the DOMAIN level before
(and in addition to) per-document filtering: parse each record's
target URL, drop blocklisted domains (UT1-style lists), and cap any
single registered domain's contribution so SEO farms and mirror
hosts cannot dominate the corpus (C4 and Gopher both apply per-domain
limits). These are the relational pieces:

* :func:`parse_url_columns` — host / registered-domain / TLD / path
  depth as pure column expressions (regexes written to mean the same
  thing in Java regex and RE2, so the DuckDB oracle mirrors exactly).
  The registered-domain extraction is the last-two-labels
  approximation — a full public-suffix list is a broadcast lookup
  table away and the join shape would be identical.
* :func:`blocklist_filter` — broadcast LEFT ANTI join against a
  blocklist relation (at UT1 scale the list is millions of rows:
  still tiny against the corpus, still a broadcast).
* :func:`domain_cap` — keep at most k docs per registered domain by
  salted-md5 rank: deterministic, reproducible under re-runs, and
  unbiased by crawl order (the md5 rank is the t20 stratified-take-k
  device applied to domains). One shuffle (the per-domain window);
  the cap itself is what bounds the heavy-domain partition's output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def parse_url_columns(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``host``, ``reg_domain``, ``tld``, ``path_depth`` parsed
    from an absolute http(s) URL column."""
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^https?://([^/]+)", 1)
    path = F.regexp_replace(url, r"^https?://[^/]+", "")
    return df.withColumns(
        {
            "host": host,
            "reg_domain": F.regexp_extract(
                host, r"([^.]+\.[^.]+)$", 1
            ),
            "tld": F.regexp_extract(host, r"\.([a-z]+)$", 1),
            "path_depth": (
                F.length(path)
                - F.length(F.regexp_replace(path, "/", ""))
            ).cast("bigint"),
        }
    )


def blocklist_filter(
    df: DataFrame, domain_col: str, blocklist: DataFrame
) -> DataFrame:
    """Drop rows whose domain appears in the blocklist relation
    (single column named ``blocked``) — broadcast LEFT ANTI join."""
    return df.join(
        F.broadcast(blocklist),
        df[domain_col] == blocklist["blocked"],
        "left_anti",
    )


def domain_rank(
    id_col: str, domain_col: str, salt: str = "s16-v1"
) -> Column:
    """Deterministic per-domain rank: salted md5 over the doc id."""
    return F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit("#" + salt)
                )
            )
        )
    )


def domain_cap(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    k: int,
    salt: str = "s16-v1",
) -> DataFrame:
    """Keep at most ``k`` docs per domain (salted-md5 rank — crawl-
    order independent and reproducible), with the rank retained as
    ``domain_rank``."""
    return df.withColumn(
        "domain_rank",
        domain_rank(id_col, domain_col, salt).cast("bigint"),
    ).filter(F.col("domain_rank") <= k)
