"""Loader for real archived-SERP WARC fixtures (jsonl manifest + per-record
gzip-member .warc.gz, the layout of the reference's test corpus — each WARC
record is an independent gzip member at ``warc_location.offset`` with
``warc_location.length`` bytes, exactly like the reference's MockWarcStore,
tests/utils.py:30-48).

Used by the parity tests and by ``bench.py``'s ``warc_xpath_real`` line,
which measures the XPath cascades over genuine crawled markup (100-420 KB
SERPs, CJK/Cyrillic charsets, malformed HTML) rather than synthetic
documents. Reading happens on the driver because the fixture tree is small
(hundreds of MB); at scale the same per-record gzip-member decode runs
inside ``sources.bundles`` ranged reads on executors.
"""

from __future__ import annotations

import gzip
import io
import json
from pathlib import Path

__all__ = ["read_record_html", "load_fixture_rows"]


def read_record_html(warc_path: Path, offset: int, length: int) -> str:
    """Decode one WARC response record (own gzip member) to HTML text:
    strip WARC + HTTP header blocks, gunzip a gzip-magic body, then decode
    through the repo's PRODUCTION waterfall (functions/encoding.py
    detect_decode: header charset → BOM sniff → utf-8 → cp1252,
    windows-874→cp874) — the same text the pipeline's decode stage would
    hand the cascades, so benches and parity runs over this loader measure
    the production path. Final utf-8/'replace' only if even cp1252's
    unmapped bytes reject the payload."""
    from archive_query_log_spark.functions.encoding import detect_decode

    with warc_path.open("rb") as f:
        f.seek(offset)
        buf = f.read(length)
    data = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
    warc_end = data.index(b"\r\n\r\n")
    http_end = data.index(b"\r\n\r\n", warc_end + 4)
    headers = data[warc_end + 4 : http_end].decode("latin-1")
    body = data[http_end + 4 :]
    if body[:2] == b"\x1f\x8b":
        body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
    content_type = None
    for line in headers.split("\r\n"):
        if line.lower().startswith("content-type"):
            content_type = line.split(":", 1)[1].strip()
            break
    got = detect_decode(body, content_type)
    if got is not None:
        return got[1]
    return body.decode("utf-8", "replace")


def load_fixture_rows(
    fixtures_dir: str | Path, limit_per_provider: int | None = None
) -> list[tuple[str, str, str]]:
    """All (provider_id, url, html) rows from every ``<name>.jsonl`` +
    ``<name>.warc.gz`` pair under ``fixtures_dir``. URLs are normalized the
    way the reference feeds them to its parsers (pydantic ``HttpUrl``).

    Fails fast without pydantic — same contract as result_blocks_udf /
    parse_serp_udf: a silent raw-URL fallback would feed parity tests
    environment-dependent inputs and report false mismatches."""
    try:
        from pydantic import HttpUrl
    except ImportError as exc:  # pragma: no cover - pydantic ships here
        raise ImportError(
            "load_fixture_rows requires pydantic for reference-parity URL"
            " normalization (HttpUrl.encoded_string); refusing to fall back"
            " to raw URLs — parity corpora would silently diverge"
        ) from exc

    def norm(u: str) -> str:
        return HttpUrl(u).encoded_string()

    fixtures_dir = Path(fixtures_dir)
    rows: list[tuple[str, str, str]] = []
    for jsonl in sorted(fixtures_dir.glob("*.jsonl")):
        warc = fixtures_dir / f"{jsonl.stem}.warc.gz"
        if not warc.exists():
            continue
        n = 0
        for line in jsonl.read_text().splitlines():
            if limit_per_provider is not None and n >= limit_per_provider:
                break
            rec = json.loads(line)
            loc = rec["warc_location"]
            rows.append(
                (
                    rec["provider"]["id"],
                    norm(rec["capture"]["url"]),
                    read_record_html(warc, loc["offset"], loc["length"]),
                )
            )
            n += 1
    return rows
