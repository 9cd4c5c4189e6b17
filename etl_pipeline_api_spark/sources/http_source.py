"""Paginated HTTP extract (SURVEY.md §2.1 op-http-paginated-source,
op-rate-limit-retry, op-incremental-skip, op-politeness-delay).

Mirrors the reference's extract loop (proj-eng-dados/main.py:42-101):
token-auth GET, follow the ``next`` cursor, stop on empty ``results``,
sleep 15 s on HTTP 429 and retry the same URL, 1 s politeness delay,
resume by skipping already-downloaded page numbers.

This is deliberately DRIVER-SIDE: the cursor chain is sequential by
construction (each page's URL comes from the previous response), so there is
no executor parallelism to exploit. The Spark boundary is
``pages_to_dataframe`` — page payloads become a distributed DataFrame via
``spark.read.json`` over the saved files (never a driver-side row loop).

The transport is injectable (any ``get(url, headers) -> (status, text)``
callable), so tests run against a fake server and no network access is
assumed. Sleeps are injectable for the same reason.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path
from time import sleep as _real_sleep

Transport = Callable[[str, dict[str, str]], tuple[int, str]]


class HttpExtractError(RuntimeError):
    pass


def _requests_transport(url: str, headers: dict[str, str]) -> tuple[int, str]:
    import requests  # gated: only imported when a real transport is used

    resp = requests.get(url, headers=headers, timeout=60)
    return resp.status_code, resp.text


@dataclass
class PaginatedHttpSource:
    """Resumable paginated REST extract writing one JSON file per page."""

    base_url: str
    out_dir: str
    token: str | None = None
    page_prefix: str = "page"
    max_pages: int = 1000            # corpus cap (README.md:61)
    politeness_delay_s: float = 1.0  # main.py:94-95
    rate_limit_backoff_s: float = 15.0  # main.py:67-71
    max_retries: int = 5
    transport: Transport = field(default=None)  # type: ignore[assignment]
    sleep: Callable[[float], None] = _real_sleep

    def __post_init__(self) -> None:
        if self.transport is None:
            self.transport = _requests_transport

    @property
    def headers(self) -> dict[str, str]:
        return {"Authorization": f"Token {self.token}"} if self.token else {}

    def downloaded_pages(self) -> set[int]:
        """op-incremental-skip (main.py:52-63): parse N from *_page_N.json."""
        out = set()
        for f in Path(self.out_dir).glob(f"{self.page_prefix}_*.json"):
            m = re.search(r"_(\d+)$", f.stem)  # op-filename-parse (main.py:53-54)
            if m:
                out.add(int(m.group(1)))
        return out

    def _get_with_retry(self, url: str) -> str:
        """op-rate-limit-retry: 429 → fixed backoff, same URL."""
        for _ in range(self.max_retries):
            status, text = self.transport(url, self.headers)
            if status == 429:
                self.sleep(self.rate_limit_backoff_s)
                continue
            if status >= 400:
                raise HttpExtractError(f"HTTP {status} for {url}")
            return text
        raise HttpExtractError(f"still rate-limited after {self.max_retries} tries: {url}")

    def fetch(self) -> list[Path]:
        """Run the extract loop; returns paths of files written this run.

        Stop conditions mirror main.py:75-79: empty ``results`` or a null
        ``next`` cursor. Already-downloaded pages are skipped but their
        ``next`` cursor is still honored by re-deriving the page URL pattern
        (the reference re-requests the page; we skip the write only).
        """
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        have = self.downloaded_pages()
        written: list[Path] = []
        url, page = self.base_url, 1
        while url and page <= self.max_pages:
            body = self._get_with_retry(url)
            payload = json.loads(body)
            results = payload.get("results") if isinstance(payload, dict) else payload
            if not results:
                break
            if page not in have:
                path = Path(self.out_dir) / f"{self.page_prefix}_{page}.json"
                path.write_text(
                    json.dumps(payload, ensure_ascii=False, indent=4), encoding="utf-8"
                )
                written.append(path)
            url = payload.get("next") if isinstance(payload, dict) else None
            page += 1
            if url:
                self.sleep(self.politeness_delay_s)
        return written
