"""Encoding-detection waterfall for binary text payloads (SURVEY.md §2.9
support op; reference: parsers/utils/xml.py:26-129).

Reference semantics reproduced:
- candidate list = [charset from the Content-Type header (first, if any),
  detected encodings, 'utf-8-sig' appended when 'utf-8' is a candidate]
  (xml.py:48-70);
- 'windows-874' is mapped to Python's 'cp874' (xml.py:75-77);
- the FIRST candidate that decodes the whole payload without error wins;
  none → None (xml.py:72-95).

One substitution, documented: the reference detects candidate encodings with
resiliparse (a compiled wheel that does not ship in this container); here
detection = BOM sniffing (utf-8-sig / utf-16) + the fixed fallback ladder
utf-8 → cp1252 — cp1252 is total (every byte decodes), so the ladder always
terminates like the reference's list does in practice.

Spark shape: detection is per-payload Python → one Arrow-batched pandas UDF
(`decode_text_udf`) returning struct<encoding, text>; never row-at-a-time.
"""

from __future__ import annotations

import codecs

import pandas as pd

_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)

_FALLBACKS = ("utf-8", "cp1252")


def candidate_encodings(buf: bytes, content_type: str | None = None) -> list[str]:
    """Candidate list in reference precedence order (xml.py:48-70)."""
    detected: list[str] = []
    for bom, enc in _BOMS:
        if buf.startswith(bom):
            detected.append(enc)
            break
    detected.extend(_FALLBACKS)
    encodings: list[str] = []
    # exact xml.py:55-59 condition: the header charset is only honored when
    # the Content-Type ALSO contains ';' — a malformed bare "charset=x"
    # header is ignored, matching the reference branch for branch
    if (
        content_type is not None
        and ";" in content_type
        and "charset=" in content_type
    ):
        encodings.extend(
            part.strip().removeprefix("charset=").lower()
            for part in content_type.split(";")
            if part.strip().startswith("charset=")
        )
    encodings.extend(detected)
    if "utf-8" in encodings and "utf-8-sig" not in encodings:
        encodings.append("utf-8-sig")
    # de-dup, keep order
    return list(dict.fromkeys(encodings))


def detect_decode(
    buf: bytes | None, content_type: str | None = None
) -> tuple[str, str] | None:
    """(winning encoding, decoded text) via the waterfall; None if no
    candidate decodes (or the payload is null)."""
    if buf is None:
        return None
    for encoding in candidate_encodings(buf, content_type):
        if encoding == "windows-874":  # xml.py:75-77
            encoding = "cp874"
        try:
            return encoding, buf.decode(encoding)
        except (UnicodeDecodeError, UnicodeError, LookupError):
            continue
    return None


def parse_gate(
    head: str | None, content_type: str | None
) -> tuple[str | None, str]:
    """Post-decode parse gating, reproducing parse_xml_tree's decision order
    (xml.py:28-31,105-119) on the first 100 decoded characters:

    1. no Content-Type header at all → (None, 'no-mime')  (xml.py:28-31)
    2. mime = header up to the first ';'                  (xml.py:31)
    3. '<' not in head → (None, 'non-xml')  — silent skip (xml.py:105-107)
    4. head[0] in '{[\"' → (None, 'json-like')            (xml.py:108-110)
    5. text/xml → ('xml', 'ok'); text/html → ('html', 'ok');
       anything else → (None, 'no-parser')                (xml.py:112-119)

    Order matters and is pinned by tests: a JSON payload whose text contains
    '<' is rejected as json-like, one without '<' as non-xml, both BEFORE
    the parser-selection branch even when the mime type is unparseable."""
    if content_type is None:
        return None, "no-mime"
    mime = content_type.split(";", 1)[0]
    # the reference reads exactly 100 decoded chars (xml.py:100-104);
    # enforce the slice here so callers may pass the full text
    head = (head or "")[:100]
    if "<" not in head:
        return None, "non-xml"
    if head[:1] in ("{", "[", '"'):
        return None, "json-like"
    if mime == "text/xml":
        return "xml", "ok"
    if mime == "text/html":
        return "html", "ok"
    return None, "no-parser"


def decode_text_udf():
    """Arrow-batched (payload binary, content_type string) →
    struct<encoding string, text string>; nulls where the waterfall fails."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("encoding string, text string")
    def _decode(payload: pd.Series, content_type: pd.Series) -> pd.DataFrame:
        enc_out, txt_out = [], []
        for buf, ct in zip(payload, content_type):
            got = detect_decode(None if buf is None else bytes(buf), ct)
            enc_out.append(None if got is None else got[0])
            txt_out.append(None if got is None else got[1])
        return pd.DataFrame({"encoding": enc_out, "text": txt_out})

    return _decode
