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
    buf: bytes | None, content_type: str | None = None, sniff: bool = False
) -> tuple[str, str] | None:
    """(winning encoding, decoded text) via the waterfall; None if no
    candidate decodes (or the payload is null).

    ``sniff=True`` inserts the statistical charset sniffer
    (sniff_encoding below) IMMEDIATELY BEFORE the cp1252 terminal — it
    only ever fires for payloads the declared/BOM/utf-8 rungs all
    rejected, the exact branch where the fixed ladder otherwise decodes
    legacy-charset text as cp1252 mojibake. Default OFF: the default
    ladder (and every golden/oracle derived from it) is unchanged."""
    if buf is None:
        return None
    candidates = candidate_encodings(buf, content_type)
    if sniff:
        guess = sniff_encoding(buf)
        if guess is not None:
            # rank the guess above the cp1252 TERMINAL but never above a
            # DECLARED charset — when the header itself says cp1252, the
            # dedup in candidate_encodings merged terminal into the header
            # slot, so inserting before it would jump the declared rung
            declared = []
            if (
                content_type is not None
                and ";" in content_type
                and "charset=" in content_type
            ):
                declared = [
                    p.strip().removeprefix("charset=").lower()
                    for p in content_type.split(";")
                    if p.strip().startswith("charset=")
                ]
            if "cp1252" in candidates and "cp1252" not in declared:
                i = candidates.index("cp1252")
            else:
                i = len(candidates)
            candidates = candidates[:i] + [guess] + candidates[i:]
    for encoding in candidates:
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


def decode_text_udf(sniff: bool = False):
    """Arrow-batched (payload binary, content_type string) →
    struct<encoding string, text string>; nulls where the waterfall fails.
    ``sniff=True`` enables the statistical charset rung (see
    detect_decode)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("encoding string, text string")
    def _decode(payload: pd.Series, content_type: pd.Series) -> pd.DataFrame:
        enc_out, txt_out = [], []
        for buf, ct in zip(payload, content_type):
            got = detect_decode(
                None if buf is None else bytes(buf), ct, sniff=sniff
            )
            enc_out.append(None if got is None else got[0])
            txt_out.append(None if got is None else got[1])
        return pd.DataFrame({"encoding": enc_out, "text": txt_out})

    return _decode


# --- statistical charset sniffer (opt-in rung) -------------------------------
#
# The reference's resiliparse detect_encoding covers the one branch this
# module's fixed ladder cannot: a payload whose charset is neither declared
# nor BOM'd nor valid utf-8. The sniffer below is an original
# script-coherence heuristic for that branch (public-knowledge technique:
# decode under each candidate, score how much of the non-ASCII content
# lands in the charset's native script, penalize control/unassigned chars
# and Latin text that is mostly high bytes). OPT-IN (sniff=True in
# detect_decode / decode_text_udf): the default ladder — and with it every
# frozen golden and oracle — is unchanged.

# candidates in tie-break preference order → native-script codepoint ranges
_SNIFF_CANDIDATES: tuple[tuple[str, tuple[tuple[int, int], ...]], ...] = (
    ("cp1252", ((0xC0, 0x17F),)),               # Latin-1/Extended-A letters
    ("cp1251", ((0x400, 0x4FF),)),              # Cyrillic
    ("cp874", ((0xE00, 0xE7F),)),               # Thai
    ("shift_jis", ((0x3040, 0x30FF), (0x4E00, 0x9FFF))),  # kana + CJK
    ("euc_jp", ((0x3040, 0x30FF), (0x4E00, 0x9FFF))),
    ("euc_kr", ((0xAC00, 0xD7AF), (0x1100, 0x11FF))),     # Hangul
    ("gb18030", ((0x4E00, 0x9FFF), (0x3000, 0x303F))),    # CJK + punct
    ("big5", ((0x4E00, 0x9FFF), (0x3000, 0x303F))),
)
# NOTE: half-width katakana (U+FF61-FF9F) is deliberately NOT native for
# shift_jis — single high bytes of OTHER charsets decode there, so counting
# it would reward mojibake more often than it recognizes real SJIS text.

_SNIFF_MIN_SCORE = 0.6
_SNIFF_SAMPLE = 16 * 1024
_MULTIBYTE = {"shift_jis", "euc_jp", "euc_kr", "gb18030", "big5"}


def sniff_encoding(buf: bytes) -> str | None:
    """Best-scoring candidate charset for an undeclared, BOM-less,
    non-utf-8 payload; None when nothing scores ≥ 0.6 (caller falls back
    to the cp1252 terminal exactly as before).

    Scoring, beyond the native-script ratio:
    - a MULTIBYTE charset that decodes the whole sample cleanly earns a
      structural bonus — prose with ASCII spaces/punctuation breaks wrong
      multibyte decodes, so a clean decode is real evidence, while
      single-byte tables decode anything;
    - Japanese claims (shift_jis/euc_jp) require kana: real Japanese prose
      is kana-heavy, Chinese/Korean decoded through a Japanese table is
      not — below 20 % kana the claim is penalized;
    - a Korean claim (euc_kr) requires ≥ 70 % hangul among non-ASCII —
      Chinese GB text decoded as euc_kr lands only partially in the
      hangul rows;
    - Latin-1 (cp1252) is damped when the letter stream is mostly high
      bytes (another script's mojibake reads as accented Latin).
    The EUC-family structural overlap is the known hard case — a wrong
    pick between gb18030/big5 on pure-hanzi text remains possible (real
    detectors use trained byte-distribution models); ties resolve by the
    candidate order above."""
    sample = buf[:_SNIFF_SAMPLE]
    best_score = None
    best_enc: str | None = None
    for enc, ranges in _SNIFF_CANDIDATES:
        try:
            text = sample.decode(enc)
        except (UnicodeDecodeError, UnicodeError):
            continue
        non_ascii = [ord(ch) for ch in text if ord(ch) > 0x7F]
        if len(non_ascii) < 4:
            continue  # too little evidence to claim anything statistical
        letters = sum(1 for ch in text if ch.isalpha())
        hi_letters = sum(1 for ch in text if ch.isalpha() and ord(ch) > 0x7F)
        if letters and hi_letters / letters < 0.03:
            # an essentially-Latin page with a handful of stray high bytes
            # must NOT be claimed: measured on the 870-SERP real corpus,
            # every false sniff (German pages → cp1251, Latin pages →
            # gb18030/cp874) sits below 1% non-ASCII letters while every
            # true legacy-charset page sits above 4%
            continue
        native = sum(
            1 for o in non_ascii if any(lo <= o <= hi for lo, hi in ranges)
        )
        bad = sum(1 for ch in text if 0x7F <= ord(ch) <= 0x9F)
        score = native / len(non_ascii) - bad / max(1, len(text)) * 4.0
        if enc in _MULTIBYTE:
            score += 0.3  # clean structural decode of a multibyte stream
        elif enc in ("cp1251", "cp874") and native / len(non_ascii) >= 0.9:
            # fully script-coherent Cyrillic/Thai is as strong a signal as
            # a clean multibyte decode (Thai especially: its long unspaced
            # runs often pair up into a structurally-valid gb decode) —
            # the matching bonus lets the tie resolve by candidate order
            score += 0.3
        if enc in ("shift_jis", "euc_jp"):
            kana = sum(1 for o in non_ascii if 0x3040 <= o <= 0x30FF)
            score += 0.4 if kana / len(non_ascii) >= 0.2 else -0.4
        if enc == "euc_kr":
            hangul = sum(1 for o in non_ascii if 0xAC00 <= o <= 0xD7AF)
            score += 0.4 if hangul / len(non_ascii) >= 0.7 else -0.4
        if enc == "cp1252":
            letters = [ch for ch in text if ch.isalpha()]
            if letters:
                hi = sum(1 for ch in letters if ord(ch) > 0x7F) / len(letters)
                if hi > 0.4:
                    score *= 0.5
        if score >= _SNIFF_MIN_SCORE and (
            best_score is None or score > best_score
        ):
            best_score = score
            best_enc = enc
    return best_enc
