"""REST/HTTP source (operator S1, SURVEY.md §2.1).

The reference GETs two JSON documents on the driver
(Pharma_Ingestion_Cleaning.py:15-27). The pattern preserved here:
fetch → land to storage → `spark.read`. Landing first (instead of
parsing into driver memory) keeps the driver O(1) in dataset size and
makes the ingest replayable/idempotent.

`requests` may be absent in this environment — the import is gated and
the fetch raises a clear error if unavailable. Tests exercise the
landing + read path with a local file.
"""

from __future__ import annotations

import json
import os

DEFAULT_TIMEOUT = 30  # seconds — parity with ING:21


def fetch_to_landing(url: str, landing_path: str, timeout: int = DEFAULT_TIMEOUT) -> str:
    """GET `url` and write the raw body to `landing_path`. Returns the
    landing path. Raises on HTTP errors (parity with
    raise_for_status, ING:22)."""
    try:
        import requests  # gated: not guaranteed in every runtime
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "requests is not installed; land the JSON manually and use "
            "sources.json_ingest.read_letter_keyed_json on the file"
        ) from e
    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    os.makedirs(os.path.dirname(landing_path) or ".", exist_ok=True)
    with open(landing_path, "w", encoding="utf-8") as f:
        f.write(resp.text)
    return landing_path


def land_dict(doc: dict, landing_path: str) -> str:
    """Test/offline helper: write an in-memory dict as the landing file
    (same contract as fetch_to_landing)."""
    os.makedirs(os.path.dirname(landing_path) or ".", exist_ok=True)
    with open(landing_path, "w", encoding="utf-8") as f:
        json.dump(doc, f)
    return landing_path
