"""REST JSON API source with predicate pushdown — SURVEY.md §2.1 S3/S4.

The reference pulls observation feeds two ways:
- SQL-over-HTTP POST to Fusion Tables, full-feed re-read per access
  (turtle-tracks.Rmd:24-43, app.R:79-99);
- authenticated GET with *filters pushed into the query string*
  (`?where=17&when__year=2017&limit=10000`, track_analysis.R:14-18) — a
  hand-rolled predicate pushdown.

Spark-first shape: the fetch is driver-side (the feed is an API, not a
splittable store), the parse is distributed — raw JSON strings become one
Spark partition per page and `from_json` with an explicit schema runs on
executors. Predicate pushdown is first-class: supported filters become query
params; unsupported ones stay in the plan as post-filters (exactly how a
DataSourceV2 SupportsPushDownFilters split works).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# A fetcher takes a fully-built URL + headers and returns the response body
# (str). Injected so tests and offline runs never touch the network.
Fetcher = Callable[[str, dict[str, str]], str]


def _default_fetcher(url: str, headers: dict[str, str]) -> str:
    from urllib.request import Request, urlopen

    req = Request(url, headers=headers)
    with urlopen(req, timeout=60) as resp:  # noqa: S310 — caller controls URL
        return resp.read().decode("utf-8")


@dataclass
class RestSource:
    """Declarative REST source: base URL, record schema, pushdown-able params.

    ``pushdown_params`` maps DataFrame column names to query-param names —
    an equality/limit filter on such a column is served by the API
    (track_analysis.R:14's `where=`/`when__year=` pattern); anything else is
    applied post-parse by Catalyst.
    """

    base_url: str
    schema: StructType
    records_path: str = "objects"  # key of the record array in the payload
    pushdown_params: dict[str, str] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    fetcher: Fetcher = _default_fetcher
    page_size: int | None = None

    def read(
        self,
        spark: SparkSession,
        filters: dict[str, object] | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        pushed, residual = self._split_filters(filters or {})
        records = list(self._fetch_all(pushed, limit))
        # Parallelize the raw JSON strings; parse on executors with the
        # explicit schema (F14: no driver-side row loop, unlike the
        # reference's unlist/get_stuff per-record extraction).
        raw = spark.createDataFrame(
            [(json.dumps(r),) for r in records], "raw string"
        )
        df = raw.select(F.from_json("raw", self.schema).alias("rec")).select("rec.*")
        for col, value in residual.items():
            df = df.filter(F.col(col) == F.lit(value))
        return df

    def _fetch_all(
        self, pushed: dict[str, object], limit: int | None
    ) -> Iterable[dict]:
        """Single fetch, or a pagination loop when ``page_size`` is set:
        offset/limit pages until a short page or the caller's limit. The
        reference's feed caps at limit=10000 and silently truncates
        (track_analysis.R:14); paging makes the full feed reachable."""
        if self.page_size is None:
            url = self._build_url(pushed, limit)
            yield from self._extract_records(self.fetcher(url, self.headers))
            return
        fetched = 0
        offset = 0
        while True:
            page_limit = self.page_size
            if limit is not None:
                page_limit = min(page_limit, limit - fetched)
                if page_limit <= 0:
                    return
            url = self._build_url({**pushed, "_offset": offset}, page_limit)
            page = list(self._extract_records(self.fetcher(url, self.headers)))
            yield from page
            fetched += len(page)
            offset += len(page)
            if len(page) < page_limit:
                return

    # -- pushdown mechanics --------------------------------------------------
    def _split_filters(
        self, filters: dict[str, object]
    ) -> tuple[dict[str, object], dict[str, object]]:
        pushed = {k: v for k, v in filters.items() if k in self.pushdown_params}
        residual = {k: v for k, v in filters.items() if k not in self.pushdown_params}
        return pushed, residual

    def _build_url(self, pushed: dict[str, object], limit: int | None) -> str:
        from urllib.parse import urlencode

        params = {
            ("offset" if k == "_offset" else self.pushdown_params[k]): v
            for k, v in pushed.items()
        }
        if limit is not None:
            params["limit"] = limit
        qs = urlencode(params)
        sep = "&" if "?" in self.base_url else "?"
        return f"{self.base_url}{sep}{qs}" if qs else self.base_url

    def _extract_records(self, body: str) -> Iterable[dict]:
        payload = json.loads(body)
        if self.records_path:
            for key in self.records_path.split("."):
                payload = payload[key]
        if not isinstance(payload, list):
            raise ValueError(
                f"records_path {self.records_path!r} did not yield a list"
            )
        return payload
