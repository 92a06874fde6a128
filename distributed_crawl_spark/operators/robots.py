"""Robots gate (north-rule addition — absent in the reference, SURVEY.md §2.6 J4).

The robots table is (host, robots_txt). Frontier rows join it on ``host``
— broadcast when small, shuffle otherwise — then a vectorized pandas UDF
evaluates ``urllib.robotparser`` per row, caching one parsed
RobotFileParser per distinct host inside each Arrow batch (batches arrive
host-clustered after the politeness window's host partitioning, so the
cache hit rate is high).

NULL / empty robots_txt → allow-all (the crawler's conventional default
for missing robots.txt).
"""

from __future__ import annotations

from urllib import robotparser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

USER_AGENT = "*"


@pandas_udf(BooleanType())
def robots_allowed_udf(url: pd.Series, robots_txt: pd.Series) -> pd.Series:
    cache: dict[str, robotparser.RobotFileParser | None] = {}

    def allowed(u: str, txt) -> bool:
        if txt is None or not str(txt).strip():
            return True
        txt = str(txt)
        rp = cache.get(txt)
        if rp is None:
            rp = robotparser.RobotFileParser()
            rp.parse(txt.splitlines())
            cache[txt] = rp
        return rp.can_fetch(USER_AGENT, u)

    return pd.Series(
        [allowed(u, t) for u, t in zip(url, robots_txt)], dtype=bool
    )


def apply_robots_gate(
    frontier: DataFrame, robots: DataFrame, broadcast_robots: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, denied). ``robots`` has columns
    (host, robots_txt); hosts absent from it are allowed."""
    r = robots.select("host", "robots_txt")
    if broadcast_robots:
        r = F.broadcast(r)
    joined = frontier.join(r, "host", "left")
    flagged = joined.withColumn(
        "robots_ok", robots_allowed_udf(F.col("url"), F.col("robots_txt"))
    )
    allowed = flagged.filter(F.col("robots_ok")).drop("robots_ok", "robots_txt")
    denied = flagged.filter(~F.col("robots_ok")).drop("robots_ok", "robots_txt")
    return allowed, denied
