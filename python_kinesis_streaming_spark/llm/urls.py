"""URL hygiene for web-corpus ingestion: canonicalization, domain
extraction, blocklist filtering, and RFC 9309 robots.txt evaluation —
the filtering pass that sits between WARC ingestion (llm/warc.py) and
text extraction.

Everything on the URL hot path is JVM expressions over Spark's
built-in ``parse_url``: normalization is string surgery (lowercase
scheme+host, default-port strip, fragment strip, tracking-param strip,
deterministic query re-ordering), so a trillion URLs never touch
Python. robots.txt PARSING is a per-file Python kernel (line-grouped
stateful parse, Arrow-batched, one robots file is KB-sized); robots
MATCHING is JVM again — each rule is compiled once to a regex column
and evaluated with ``regexp_like``, longest-match-wins resolved by one
per-URL window over the (broadcastable) rules table.

Scale shape: rules tables are per-domain and tiny relative to the URL
table — the match join is broadcast; the per-URL winner is a window
partitioned by url (bounded by matching rules per URL, typically
<100). Blocklists join on registered domain with a broadcast
anti-join. No global state, no driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Common tracking parameters stripped during normalization (public,
# widely-documented analytics keys).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_eid", "igshid",
)

# Minimal two-level public-suffix approximation: hosts ending in one of
# these keep three labels for the registered domain, else two.
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.nz", "com.br", "com.mx", "co.in",
    "com.cn", "com.sg", "com.tr", "co.za", "com.ar", "co.kr",
)


def url_host(url: Column | str) -> Column:
    return F.lower(F.parse_url(F.col(url) if isinstance(url, str) else url,
                               F.lit("HOST")))


def registered_domain(host: Column) -> Column:
    """eTLD+1 approximation: last two host labels, or three when the
    last two form a known two-level suffix. Built-in list, in-row."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    take3 = last2.isin(*_TWO_LEVEL_SUFFIXES) & (n >= 3)
    return F.when(
        take3, F.concat_ws(".", F.slice(labels, n - 2, 3))
    ).otherwise(last2)


def normalize_url(url: Column | str) -> Column:
    """Canonical form: lowercase scheme+host, default port stripped,
    fragment dropped, tracking params dropped, remaining query params
    sorted (deterministic dedup key), trailing '?'/'#' removed, empty
    path → '/'.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    # parse_url HOST excludes the port; fish it out of AUTHORITY
    authority = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.parse_url(u, F.lit("PATH"))
    path = F.when(
        path.isNull() | (path == ""), F.lit("/")
    ).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda kv: (F.length(kv) > 0)
            & ~F.lower(F.regexp_extract(kv, r"^([^=]*)", 1)).isin(
                *TRACKING_PARAMS
            ),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, qpart)


def dedup_by_url(df: DataFrame, url_col: str) -> DataFrame:
    """Keep one row per normalized URL (min-``ordinal`` row wins when an
    ``ordinal`` column exists, with the raw URL as tie-break; else
    arbitrary-but-deterministic via the raw URL sort)."""
    normed = df.withColumn("_norm_url", normalize_url(url_col))
    order = (
        [F.col("ordinal").asc_nulls_last(), F.col(url_col)]
        if "ordinal" in df.columns
        else [F.col(url_col)]
    )
    w = Window.partitionBy("_norm_url").orderBy(*order)
    return (
        normed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_norm_url", "normalized_url")
    )


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocklist: DataFrame
) -> DataFrame:
    """Drop rows whose registered domain is in ``blocklist(domain)``.
    Broadcast anti-join — blocklists are small next to the corpus."""
    keyed = df.withColumn(
        "_dom", registered_domain(url_host(url_col))
    )
    return keyed.join(
        F.broadcast(blocklist.select(F.lower("domain").alias("_dom"))),
        "_dom",
        "left_anti",
    ).drop("_dom")


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309)
# ---------------------------------------------------------------------------


def parse_robots_frame(
    df: DataFrame, host_col: str, payload_col: str
) -> DataFrame:
    """(host, agent, allow, rule, rule_regex) rows from robots.txt
    payloads — one input row per (host, robots.txt bytes).

    Parsing follows RFC 9309 grouping: consecutive ``User-agent``
    lines open a group; ``Allow``/``Disallow`` lines apply to every
    agent of the current group; empty Disallow means allow-all (no
    rule emitted). ``rule_regex`` compiles the path pattern once
    (escape, ``*`` → ``.*``, trailing ``$`` anchor) so matching stays
    JVM-side.
    """

    def parse(batches):
        import re as _re

        import pandas as pd

        def compile_rule(rule: str) -> str:
            pat = _re.escape(rule)
            pat = pat.replace(r"\*", ".*")
            if pat.endswith(r"\$"):
                pat = pat[: -len(r"\$")] + "$"
            return "^" + pat

        for pdf in batches:
            out = {
                "host": [], "agent": [], "allow": [],
                "rule": [], "rule_regex": [],
            }
            for host, payload in zip(pdf[host_col], pdf[payload_col]):
                text = (
                    bytes(payload).decode("utf-8", "replace")
                    if not isinstance(payload, str)
                    else payload
                )
                agents: list[str] = []
                group_open = False
                for raw in text.splitlines():
                    line = raw.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    key, _, val = line.partition(":")
                    key = key.strip().lower()
                    val = val.strip()
                    if key == "user-agent":
                        if group_open:
                            agents = []
                            group_open = False
                        agents.append(val.lower())
                    elif key in ("allow", "disallow"):
                        group_open = True
                        if not val:
                            continue  # empty rule = no restriction
                        for a in agents or ["*"]:
                            out["host"].append(host)
                            out["agent"].append(a)
                            out["allow"].append(key == "allow")
                            out["rule"].append(val)
                            out["rule_regex"].append(compile_rule(val))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        parse,
        schema=(
            "host string, agent string, allow boolean, rule string, "
            "rule_regex string"
        ),
    )


def robots_allowed(
    urls: DataFrame,
    url_col: str,
    rules: DataFrame,
    agent: str = "*",
) -> DataFrame:
    """Add ``allowed`` per URL under RFC 9309 longest-match-wins
    (Allow beats Disallow on equal length; no matching rule = allowed).

    The rules table is filtered to ``agent`` (falling back to ``*``
    per spec: the most specific user-agent group applies) and
    broadcast; matches are resolved with one window per URL.
    """
    agent = agent.lower()
    r = rules.where(
        (F.col("agent") == agent) | (F.col("agent") == "*")
    ).withColumn("agent_specific", (F.col("agent") == agent).cast("int"))
    # RFC 9309: if any group matches the specific agent, ONLY those
    # groups apply for that host
    host_has_specific = r.groupBy("host").agg(
        F.max("agent_specific").alias("has_specific")
    )
    r = r.join(host_has_specific, "host").where(
        (F.col("has_specific") == 0) | (F.col("agent_specific") == 1)
    )

    # RFC 9309 §2.2.2 matches rules against the path AND query ("the
    # path, and optionally the query"), so 'Disallow: /*?sessionid='
    # must be matchable; a unique row key (not the URL string) keys the
    # winner window so duplicate URL rows (re-crawls, pre-dedup
    # corpora) each keep their own verdict instead of collapsing.
    path_only = F.coalesce(
        F.when(
            F.parse_url(F.col(url_col), F.lit("PATH")) == "",
            F.lit("/"),
        ).otherwise(F.parse_url(F.col(url_col), F.lit("PATH"))),
        F.lit("/"),
    )
    query_part = F.coalesce(
        F.concat(F.lit("?"), F.parse_url(F.col(url_col), F.lit("QUERY"))),
        F.lit(""),
    )
    u = (
        urls.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("_host", url_host(url_col))
        .withColumn("_path", F.concat(path_only, query_part))
    )
    matched = u.join(
        F.broadcast(r.withColumnRenamed("host", "_host")),
        "_host",
        "left",
    ).withColumn(
        "_hit",
        F.col("rule_regex").isNotNull()
        & F.regexp_like(F.col("_path"), F.col("rule_regex")),
    )
    w = Window.partitionBy("_rid").orderBy(
        F.desc("_hit"),
        F.desc(F.when(F.col("_hit"), F.length("rule")).otherwise(-1)),
        F.desc(F.when(F.col("_hit"), F.col("allow").cast("int"))),
    )
    best = (
        matched.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .withColumn(
            "allowed",
            F.when(~F.col("_hit") | F.col("_hit").isNull(), F.lit(True))
            .otherwise(F.col("allow")),
        )
    )
    keep = [c for c in urls.columns] + ["allowed"]
    return best.select(*keep)
